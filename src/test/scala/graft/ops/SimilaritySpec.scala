package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * IVF multi-probe semantics ([[Similarity.ivfBuildProbe]] nProbe knob,
 * driver query `ann_ivf_probe2`): probing the P nearest centroids must
 * strictly improve recall when a true neighbor's bucket is the query's
 * SECOND-closest centroid — the canonical IVF failure mode nProbe exists
 * to fix.
 */
class SimilaritySpec extends SparkSpec {

  test("nProbe=2 finds the planted neighbor that nProbe=1 cannot") {
    import spark.implicits._
    // 2-D corpus, 2 centroids (seeds = vec_id 0, 1):
    //   v0 (seed c0) = (1.0, 0.0)     bucket 0
    //   v1 (seed c1) = (0.8, 0.6)     bucket 1
    //   v2 = (0.5, 0.0)               bucket 0 (weak filler)
    //   v3 = (0.9, 0.44)              bucket 1 — the PLANTED neighbor:
    //        its dot with c1 (0.984) beats c0 (0.9), but its dot with
    //        the query (0.944) is the query's SECOND-best corpus match
    //   v4 = (0.1, 0.9)               bucket 1 (far from the query)
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.8f, 0.6f)),
      (2L, Seq(0.5f, 0.0f)),
      (3L, Seq(0.9f, 0.44f)),
      (4L, Seq(0.1f, 0.9f))).toDF("vec_id", "embedding")
    // the query routes to c0 first (dot 1.0 > 0.86), c1 second
    val q = Seq((100L, Seq(1.0f, 0.1f))).toDF("qid", "qe")

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

    val truth = ids(Similarity.bruteTopK(corpus, q, 2))
    assert(truth === Set(0L, 3L)) // v0 (dot 1.0) and the planted v3 (0.944)

    val p1 = ids(Similarity.ivfBuildProbe(corpus, q, 2, nCentroids = 2))
    val p2 = ids(Similarity.ivfBuildProbe(corpus, q, 2, nCentroids = 2,
      nProbe = 2))
    // nProbe=1 sees only bucket 0 — the planted neighbor is invisible
    assert(p1 === Set(0L, 2L), s"nProbe=1 should miss the planted neighbor: $p1")
    // nProbe=2 adds the second-closest bucket and recovers exact top-k
    assert(p2 === truth, s"nProbe=2 should find the planted neighbor: $p2")
    assert((p2 & truth).size > (p1 & truth).size,
      "multi-probe must strictly improve recall on the planted neighbor")
  }
}
