package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketed interval (range) join: points `p` against intervals `[lo, hi]`
 * with `lo <= p <= hi`, both inclusive.
 *
 * A naive non-equi join has no equality conjunct, so Spark can only plan
 * it as BroadcastNestedLoopJoin (every point row tested against every
 * interval — quadratic, and broadcast-bound on the interval side). The
 * standard scale-correct shape instead manufactures an equality key:
 * quantize the domain into fixed buckets, explode each interval into the
 * buckets it covers, tag each point with its single bucket, equi-join on
 * the bucket, and refine with the exact range predicate. The join
 * shuffles hash-partitioned on the bucket — linear in points + interval
 * coverage, AQE-coalesced — and a point meets an interval in exactly one
 * bucket (its own), so no dedup pass is needed.
 *
 * `bucket` trades replication for selectivity: an interval explodes into
 * ~length/bucket rows, a point's bucket co-locates ~bucket-width of
 * intervals. Pick it near the median interval length; the default in
 * [[graft.queries.OlapQueries]] uses 6h buckets for 3-38h campaign
 * periods (≤ 8 rows per interval).
 */
object RangeJoin {

  def intervalJoin(points: DataFrame, tsCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   bucket: Long): DataFrame = {
    val pts = points.withColumn("_pbkt", expr(s"$tsCol div $bucket"))
    val ivs = intervals.withColumn("_ibkt",
      explode(sequence(expr(s"$loCol div $bucket"), expr(s"$hiCol div $bucket"))))
    pts.join(ivs, col("_pbkt") === col("_ibkt") &&
        col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("_pbkt", "_ibkt")
  }
}
