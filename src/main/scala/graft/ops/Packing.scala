package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training: concatenate the corpus in a
 * deterministic document order and chunk it into fixed token-budget
 * training sequences ("concat-and-chunk", the standard pretraining
 * packing). Each document learns which global token offset it starts at
 * and therefore which pack(s) its tokens land in.
 *
 * The core primitive is a GLOBAL EXCLUSIVE CUMSUM of token counts — and
 * the naive `sum().over(Window.orderBy(id))` plan moves the entire corpus
 * through one reducer. Instead this uses the parallel-prefix-sum shape
 * (same pattern as the parallel-exact quantiles, OlapQueries q_percentile):
 *   1. range-partition rows by doc id (balanced, order-preserving across
 *      partition boundaries);
 *   2. per-partition local cumsum (window keyed by partition id — every
 *      reducer busy);
 *   3. global offset = exclusive cumsum over the per-partition totals, a
 *      P-row histogram computed once and BROADCAST back.
 * Every stage is spread over the full cluster; the only single-partition
 * object is the P-row histogram.
 */
object Packing {

  /**
   * docs: (idCol, nCol) — token counts per doc. Returns one row per doc:
   * start_tok (global exclusive cumsum), pack_id (the pack its first token
   * lands in), n_packs (how many budget-sized packs the doc spans).
   */
  def packConcat(docs: DataFrame, idCol: String, nCol: String,
                 budget: Long, partitions: Int = 0): DataFrame = {
    // partitions ≤ 0 → the session's shuffle parallelism (a constant here
    // would under-partition a real cluster); the offset histogram stays
    // one row per partition either way.
    val nParts = if (partitions > 0) partitions
      else docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = docs
      .repartitionByRange(nParts, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid")).orderBy(col(idCol))
    val local = parts.withColumn("lcum", sum(col(nCol)).over(wLocal))
    val hist = local.groupBy(col("pid")).agg(sum(col(nCol)).as("cnt"))
    // pmod(pid,1) ≡ 0: a single bounded partition (P rows) the optimizer
    // can't strip (a foldable lit(0) is eliminated from the partition spec,
    // which would re-trigger the global-window WARN).
    val wOff = Window.partitionBy(pmod(col("pid"), lit(1))).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("pid").as("opid"), col("off"))
    local
      .join(broadcast(offs), col("pid") === col("opid"))
      .withColumn("start_tok", col("lcum") - col(nCol) + col("off"))
      .withColumn("pack_id", expr(s"start_tok div $budget"))
      .withColumn("n_packs",
        expr(s"(start_tok + $nCol - 1) div $budget") - col("pack_id") + lit(1L))
      .select(col(idCol), col(nCol), col("start_tok"), col("pack_id"),
              col("n_packs"))
  }
}
