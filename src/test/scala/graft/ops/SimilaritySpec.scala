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

  test("radius search admits exactly at θ over the probed buckets (r14)") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.8f, 0.6f)),
      (2L, Seq(0.5f, 0.0f)),
      (3L, Seq(0.9f, 0.44f)),
      (4L, Seq(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1.0f, 0.1f))).toDF("qid", "qe")
    // full probe depth = exact threshold semantics: every vector with
    // dot ≥ θ, nothing else (dots: v0=1.0 v1=0.86 v2=0.5 v3=0.944
    // v4=0.19)
    val full = Similarity.ivfRadius(corpus, q, theta = 0.6,
      nCentroids = 2, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full === Set(0L, 1L, 3L))
    // nProbe=1 keeps the threshold exact over the PROBED set only —
    // bucket 1's v1/v3 are invisible, never mis-scored
    val p1 = Similarity.ivfRadius(corpus, q, theta = 0.6,
      nCentroids = 2, nProbe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(p1 === Set(0L))
    // ranks order admitted rows 1..n per query
    val ranked = Similarity.ivfRadius(corpus, q, theta = 0.6,
      nCentroids = 2, nProbe = 2)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(ranked.map(_._2).toSeq === Seq(1L, 2L, 3L))
    assert(ranked.head._1 === 0L)
  }

  test("Lloyd training flattens bucket occupancy; recall stays exact") {
    import spark.implicits._
    // Two natural clusters, but BOTH seed centroids (= the first two
    // vec_ids) land in cluster A. The seeded quantizer therefore SPLITS
    // cluster A across its two buckets and dumps ALL of cluster B into
    // whichever bucket its vectors lean toward — a hot bucket holding
    // 3/4 of the corpus, so every probe routed there scans 6× the
    // nominal 1/C. This occupancy skew is the at-scale cost of untrained
    // seeds; Lloyd rounds migrate the centroids onto the two real modes
    // and flatten the buckets to the true cluster sizes.
    val clusterA = Seq(
      (0L, Seq(1.00f, 0.00f)), (1L, Seq(0.99f, 0.14f)),
      (2L, Seq(0.98f, -0.14f)), (3L, Seq(0.97f, 0.07f)))
    val clusterB = Seq(
      (4L, Seq(0.00f, 1.00f)), (5L, Seq(0.14f, 0.99f)),
      (6L, Seq(-0.14f, 0.98f)), (7L, Seq(0.07f, 0.97f)))
    val corpus = (clusterA ++ clusterB).toDF("vec_id", "embedding")

    def occupancy(cents: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.assignToCentroids(corpus, cents, "vec_id")
        .groupBy(col("cid")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val seededOcc = occupancy(Similarity.seedCentroids(corpus, 2))
    val trainedOcc = occupancy(Similarity.trainedCentroids(corpus, 2, iters = 2))
    assert(seededOcc.values.max >= 6,
      s"fixture: both seeds in cluster A must skew occupancy, got $seededOcc")
    assert(trainedOcc.values.toSeq.sorted === Seq(4L, 4L),
      s"training should flatten buckets to the true cluster sizes: $trainedOcc")

    // recall at equal probe cost (nProbe = 1): a cluster-B query's probed
    // bucket IS cluster B after training — exact top-k
    val q = Seq((100L, Seq(0.05f, 1.0f))).toDF("qid", "qe")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val truth = ids(Similarity.bruteTopK(corpus, q, 3))
    val trained = ids(Similarity.ivfBuildProbe(corpus, q, 3, nCentroids = 2,
      trainIters = 2))
    assert(trained === truth,
      s"trained quantizer should recover the true top-k, got $trained")
    // determinism: exact quantized means from a fixed seed — twice the
    // same build, bit for bit
    assert(ids(Similarity.ivfBuildProbe(corpus, q, 3, nCentroids = 2,
      trainIters = 2)) === trained)
  }

  test("native argmax assignment ≡ the window-ranked declarative twin (ties to lowest cid)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // deterministic pseudo-random corpus incl. a planted EXACT dot tie:
    // v20's dot with EVERY centroid is exactly 0.0 (zero vector) — a
    // 4-way tie, so its probe ranks must follow cid ascending, matching
    // the window's cid-asc tiebreak
    val corpus = ((0L until 20L).map { i =>
      (i, Seq(((i * 37 % 19) - 9) / 10.0f, ((i * 53 % 17) - 8) / 10.0f,
              ((i * 71 % 13) - 6) / 10.0f))
    } :+ ((20L, Seq(0.0f, 0.0f, 0.0f)))).toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(corpus, 4)

    // the pre-r9 plan, verbatim: crossJoin + dot + row_number window
    def declarative(nProbe: Int) = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cdot").desc, col("cid").asc)
      corpus.crossJoin(broadcast(cents))
        .withColumn("cdot", Similarity.dot(col("ce"), corpus("embedding")))
        .withColumn("crn", row_number().over(w))
        .where(col("crn") <= nProbe)
        .select(col("vec_id"), col("cid"), col("crn").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    def native(nProbe: Int) = {
      val cs = Similarity.collectCentroids(cents)
      corpus.select(col("vec_id"), posexplode(
          graft.functions.NearestCentroids.nearest(col("embedding"), cs, nProbe))
          .as(Seq("pos", "cid")))
        .select(col("vec_id"), col("cid"), (col("pos") + 1).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    for (p <- Seq(1, 2, 4, 7)) // 7 > C clamps to all centroids
      assert(native(p) === declarative(p),
        s"native and window assignment must agree at nProbe=$p")
  }

  test("PQ top-k is exact on a codeword corpus (lossless quantization ≡ brute force)") {
    import spark.implicits._
    // seeds chosen per-subspace orthogonal, so every per-subspace argmax
    // assignment recovers the generating codeword; a corpus whose every
    // vector is a per-subspace MIXTURE of codewords then reconstructs
    // exactly — the asymmetric PQ score equals the true dot, and pqTopK
    // must reproduce bruteTopK bit-for-bit (score AND rank).
    val s0 = Seq(1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 1.0f, 0.0f, 0.0f)
    val s1 = Seq(0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 1.0f)
    val corpus = Seq(
      (0L, s0), (1L, s1),
      (2L, s0.take(4) ++ s1.drop(4)),   // codes (0, 1)
      (3L, s1.take(4) ++ s0.drop(4)))   // codes (1, 0)
      .toDF("vec_id", "embedding")
    val q = Seq(
      (100L, Seq(0.9f, 0.1f, 0.2f, 0.0f, 0.0f, 0.8f, 0.0f, 0.3f)),
      (101L, Seq(0.0f, 0.0f, 0.7f, 0.1f, 0.2f, 0.0f, 0.0f, 0.9f)))
      .toDF("qid", "qe")
    def ranked(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.select("qid", "vec_id", "adot", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val brute = Similarity.bruteTopK(corpus, q, 4)
      .withColumnRenamed("dot", "adot")
    val pq = Similarity.pqTopK(corpus, q, 4, m = 2, codebookSize = 2)
    assert(ranked(pq) === ranked(brute),
      "lossless PQ must reproduce exact scores and ranks")
    // determinism: the whole build+score twice, bit for bit
    assert(ranked(Similarity.pqTopK(corpus, q, 4, m = 2, codebookSize = 2)) ===
      ranked(pq))
    // malformed shapes fail loud
    intercept[IllegalArgumentException](
      Similarity.pqTopK(corpus, q, 4, m = 3, codebookSize = 2)) // 8 % 3 != 0
  }

  test("IVF-PQ degenerates to exact brute force at full probe depth") {
    import spark.implicits._
    // 8-dim corpus (divisible into 2 and 4 subspaces), 12 vectors with
    // distinct dot profiles against the query
    val corpus = (0L until 12L).map { i =>
      (i, (0 until 8).map(j =>
        (math.sin(i * 3 + j).toFloat * 0.5f + (if (j == (i % 8)) 1.0f else 0.1f))))
    }.toDF("vec_id", "embedding")
    val q = Seq((100L, (0 until 8).map(j => (0.3f + 0.1f * j)))).toDF("qid", "qe")

    // nProbe = C (every bucket probed) + kCand ≥ corpus ⇒ IVF restricts
    // nothing and the exact re-rank sees every vector: the full recipe
    // must equal brute force bit for bit — pins that neither the fused
    // assignment/encode pass nor the LUT shortlist loses candidates
    val full = Similarity.ivfPqRerank(corpus, q, 5, kCand = 12,
      nCentroids = 4, nProbe = 4, m = 4, codebookSize = 4)
      .orderBy("qid", "rnk").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val brute = Similarity.bruteTopK(corpus, q, 5)
      .select(col("qid"), col("vec_id"), col("dot"), col("rnk"))
      .orderBy("qid", "rnk").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(full === brute)

    // restricted probing returns a SUBSET of buckets' vectors with the
    // same exact dots (re-rank recomputes full precision)
    val narrow = Similarity.ivfPqRerank(corpus, q, 5, kCand = 8,
      nCentroids = 4, nProbe = 1, m = 2, codebookSize = 4)
    val dots = narrow.join(corpus, "vec_id")
      .join(q.withColumnRenamed("qid", "q2"), col("qid") === col("q2"))
      .select(col("dot"), Similarity.dotHof(col("qe"), col("embedding")).as("ref"))
      .collect()
    assert(dots.nonEmpty)
    dots.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // guard stays loud
    intercept[IllegalArgumentException](
      Similarity.ivfPqRerank(corpus, q, 5, kCand = 3))
  }

  test("matryoshka: full-prefix degenerate = brute force; short prefix re-ranks exact") {
    import spark.implicits._
    val corpus = (0 until 12).map { i =>
      (i.toLong, (0 until 8).map(j =>
        math.cos(i * 5 + j).toFloat * 0.4f + (if (j == (i % 8)) 1.0f else 0.0f)))
    }.toDF("vec_id", "embedding")
    val q = Seq((100L, (0 until 8).map(j => (0.5f - 0.05f * j))))
      .toDF("qid", "qe")

    // prefixDims = D and kCand ≥ corpus ⇒ the prefix IS the full dot
    // and the shortlist keeps everything: must equal brute force bit
    // for bit (pins that the two-stage plumbing loses nothing)
    val full = Similarity.matryoshkaTopK(corpus, q, 5, kCand = 12,
        prefixDims = 8)
      .orderBy("qid", "rnk").collect().map(_.toSeq).toSeq
    val brute = Similarity.bruteTopK(corpus, q, 5)
      .select(col("qid"), col("vec_id"), col("dot"), col("rnk"))
      .orderBy("qid", "rnk").collect().map(_.toSeq).toSeq
    assert(full === brute)

    // a SHORT prefix shortlist: reported dots are still the exact
    // full-dimension dot (re-rank recovers precision), and with a
    // kCand-wide-enough shortlist the top-k survives prefix truncation
    val short = Similarity.matryoshkaTopK(corpus, q, 3, kCand = 12,
      prefixDims = 2)
    val dots = short.join(corpus, "vec_id")
      .join(q.withColumnRenamed("qid", "q2"), col("qid") === col("q2"))
      .select(col("dot"), Similarity.dotHof(col("qe"), col("embedding")).as("ref"))
      .collect()
    dots.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(short.count() === 3L)

    intercept[IllegalArgumentException](
      Similarity.matryoshkaTopK(corpus, q, 5, kCand = 3))
  }
}
