package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Embedding quantization: symmetric per-vector int8 scalar quantization —
 * q_i = round(x_i · 127 / max|x|), reconstructed as q_i · scale with
 * scale = max|x| / 127. The standard 4× storage/bandwidth reduction for a
 * large embedding store (a 100 TB float corpus becomes 25 TB of int8 +
 * one float scale per vector), with reconstruction error bounded by
 * scale/2 per element.
 *
 * Everything is per-row column algebra (transform/zip_with/array_max over
 * the vector — no shuffle at all; the operator is a pure map over the
 * corpus scan). Determinism: floats widen to double exactly; the quantize
 * expression is fixed-order IEEE arithmetic with floor(v + 0.5) rounding
 * (identical half-up in Spark and DuckDB — never `round()`, whose
 * half-even vs half-away semantics differ between engines).
 */
object Quantize {

  /**
   * (idCol, scale, qsig, err_max) per vector: the quantization scale, an
   * md5 signature of the int8 vector (comma-joined — engine-identical and
   * hashable by the driver, where an int array column is not), and the
   * max absolute reconstruction error.
   */
  def int8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x = emb.withColumn("_amax",
      array_max(transform(col(vecCol), v => abs(v.cast(DoubleType)))))
    val scale = col("_amax") / lit(127.0)
    val qvec = transform(col(vecCol), v =>
      when(col("_amax") === 0.0, lit(0))
        .otherwise(floor(v.cast(DoubleType) * lit(127.0) / col("_amax") + lit(0.5))
          .cast("int")))
    x.withColumn("_q", qvec)
      .select(
        col(idCol),
        scale.as("scale"),
        md5(concat_ws(",", transform(col("_q"), _.cast("string")))).as("qsig"),
        array_max(zip_with(col(vecCol), col("_q"),
          (v, q) => abs(v.cast(DoubleType) - q.cast(DoubleType) * scale)))
          .as("err_max"))
  }
}
