package graft

/**
 * Evaluation-determinism pins for the distributed-rank/offset family.
 *
 * The hazard (found live in r9): repartitionByRange samples its
 * boundaries with rdd-id-seeded reservoirs, and the offset machinery's
 * two consumers (rows + per-partition totals) evaluate the exchange
 * SEPARATELY (join null-filters defeat exchange reuse) — so
 * spark_partition_id-keyed prefix totals could describe a DIFFERENT
 * bucketing than the rows they join back onto. q_mwu's exact integer
 * sum visibly drifted between runs; rank-extraction queries mostly
 * dodged it (corruption is boundary-local) but carried the same hazard.
 * The fix: pids derive from the VALUE against broadcast (min, max)
 * (OlapQueries.withBucket) — identical in every evaluation by
 * construction. These pins re-evaluate each family member and assert
 * bit-identical results; under the old machinery q_mwu failed this
 * spec in 4 of 4 observed pairs.
 */
class DeterminismSpec extends SparkSpec {

  private def run(q: String): String =
    SparkEntry.queries(q)(spark, sfDir)
      .collect().map(_.toString).sorted.mkString("|")

  for (q <- Seq("q_mwu", "q_ks", "q_wmedian", "q_mad", "q_percentile",
                "q_rfm", "q_skyline", "q_winsorize")) {
    test(s"$q evaluates bit-identically across independent runs") {
      val a = run(q)
      val b = run(q)
      assert(a === b, s"$q produced different results on re-evaluation")
    }
  }
}
