package graft

import org.apache.spark.sql.functions._

/**
 * Skew + determinism pins for the equi-depth withBucket (r10).
 *
 * The r9 cut split the VALUE RANGE against broadcast (min, max) — the
 * determinism fix for the sampled-range-partition hazard, but
 * skew-sensitive: on a heavy-tailed distribution most rows land in a
 * few buckets and the per-bucket windows degrade toward one reducer.
 * The r10 cut derives EQUI-DEPTH boundaries from a deterministic
 * KMV-style hash sample of the distinct-value histogram: still a pure
 * function of the data (re-evaluation-safe), now row-balanced under
 * any skew an order-preserving partitioner CAN balance.
 *
 * The fixture is Zipf-like (v = 10^7 div rank): the value range spans
 * [103, 10^7] while ~90% of rows sit below 10^6 — the range split
 * provably collapses onto its low buckets; equi-depth must not.
 */
class WithBucketSpec extends SparkSpec {

  private val nPart = 8
  private val n = 100000

  private def skewed = {
    import spark.implicits._
    // deterministic heavy tail: rank i ∈ [1, n] → v = 10^7 div i
    (1 to n).map(i => 10000000L / i).toDF("v")
  }

  test("equi-depth buckets balance a heavy-tailed distribution") {
    val counts = graft.queries.OlapQueries.withBucket(skewed, "v", nPart)
      .groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[Number]("pid").intValue() ->
        r.getAs[Long]("c")).toMap
    val ideal = n.toDouble / nPart
    // the single heaviest VALUE (v=103, every rank ≥ ~97088 collapses
    // onto it) is unsplittable by any order-preserving partitioner; all
    // buckets must stay within 2× ideal plus that irreducible mass
    val heaviest = skewed.groupBy(col("v")).count()
      .agg(max(col("count"))).head.getLong(0)
    val cap = 2 * ideal + heaviest
    assert(counts.values.max <= cap,
      s"hot bucket ${counts.values.max} exceeds $cap: $counts")
    // and it genuinely spreads: at least half the buckets carry rows
    assert(counts.count(_._2 > 0) >= nPart / 2, counts.toString)
  }

  test("the r9 range split provably hot-buckets the same fixture") {
    // the formula this spec exists to replace, reconstructed inline:
    // pid = ((v - lo) * nPart) div (hi - lo + 1)
    val mm = skewed.agg(min(col("v")).as("_lo"), max(col("v")).as("_hi"))
    val rangeCounts = skewed.crossJoin(broadcast(mm))
      .withColumn("pid", expr(s"((v - _lo) * $nPart) div (_hi - _lo + 1)"))
      .groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(_.getAs[Long]("c"))
    // >90% of rows in one range bucket — the hazard being fixed
    assert(rangeCounts.max > n * 0.9,
      s"fixture no longer skews: ${rangeCounts.mkString(",")}")
  }

  test("equi-depth pids are monotone in the value and evaluation-deterministic") {
    val withPid = graft.queries.OlapQueries.withBucket(skewed, "v", nPart)
    val a = withPid.collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue()))
    val b = withPid.collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue()))
    assert(a.sorted.sameElements(b.sorted), "pid drifted across evaluations")
    // monotone: bucket max of pid i never exceeds bucket min of pid i+1,
    // and equal values never straddle buckets
    val byPid = a.groupBy(_._2).view.mapValues(vs => (vs.map(_._1).min,
      vs.map(_._1).max)).toMap
    val pids = byPid.keys.toSeq.sorted
    pids.sliding(2).foreach {
      case Seq(p1, p2) =>
        assert(byPid(p1)._2 <= byPid(p2)._1,
          s"buckets $p1/$p2 overlap: ${byPid(p1)} vs ${byPid(p2)}")
      case _ => ()
    }
    val valueToPids = a.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(valueToPids.forall(_._2.size == 1), "a value straddles buckets")
  }
}
