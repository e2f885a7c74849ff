package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NN-Descent pinned against an in-memory replay of the exact same
  * rounds (same ring init, same candidate rule, same fixed-order fold,
  * same total order) — dots are deterministic doubles, so every
  * comparison is equality. Plus an honest recall floor vs the exact
  * graph: the operator is approximate by design and the suite says by
  * how much on a seeded corpus. */
class KnnGraphSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(seed: Long, n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() - 0.5f)))
  }

  /** The same left fold Similarity.dot / the oracle's list_reduce do. */
  private def dot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + x.toDouble * y.toDouble }

  /** Literal replay of nnDescent's rounds on Scala collections. */
  private def replay(c: Seq[(Long, Seq[Float])], k: Int, rounds: Int,
                     descentK: Int = 0): Map[Long, Seq[(Long, Double)]] = {
    val dk = if (descentK <= 0) k else descentK
    val emb = c.toMap
    val n = c.size.toLong
    def top(m: Int)(pairs: Seq[(Long, Long, Double)]): Map[Long, Seq[(Long, Double)]] =
      pairs.groupBy(_._1).map { case (p, ps) =>
        p -> ps.map(t => (t._2, t._3)).distinct
          .sortBy { case (q, d) => (-d, q) }.take(m)
      }
    val nb = math.max(1L, n / (4L * dk))
    def h60(id: Long): Long = { // Md5HighBits.hash60 of the decimal string
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      var v = 0L
      (0 until 7).foreach(i => v = (v << 8) | (d(i) & 0xFFL))
      (v << 4) | ((d(7) & 0xFFL) >>> 4)
    }
    val buckets: Map[Long, Seq[Long]] =
      c.map(_._1).groupBy(id => ((h60(id) % nb) + nb) % nb)
        .map { case (b, ids) => b -> ids.sorted }
    val inBucket = buckets.values.toSeq.flatMap { ids =>
      for {
        i <- ids.indices
        d <- 1 to dk
        if i + d < ids.length
      } yield (ids(i), ids(i + d))
    }
    val nCross = math.min(3L, nb - 1)
    val cross = buckets.toSeq.flatMap { case (b, ids) =>
      for {
        i <- ids.indices
        d <- 1L to nCross
        tgt = buckets.getOrElse((b + d) % nb, Seq.empty)
        if i < tgt.length
      } yield (ids(i), tgt(i))
    }
    var edges: Map[Long, Seq[(Long, Double)]] = top(dk)(
      (inBucket ++ cross).map { case (a, q) => (a, q, dot(emb(a), emb(q))) })
    for (_ <- 1 to rounds) {
      val u = edges.toSeq.flatMap { case (p, ns) =>
        ns.flatMap { case (q, _) => Seq((p, q), (q, p)) } }.distinct
      val cand = u.groupBy(_._1).values.flatMap { xs =>
        val qs = xs.map(_._2).distinct
        for (a <- qs; b <- qs if a < b) yield (a, b)
      }.toSeq.distinct
      val scored = cand.map { case (a, b) => (a, b, dot(emb(a), emb(b))) }
      val all = edges.toSeq.flatMap { case (p, ns) =>
        ns.map { case (q, d) => (p, q, d) } } ++
        scored ++ scored.map { case (a, b, d) => (b, a, d) }
      edges = top(dk)(all)
    }
    edges.map { case (p, ns) => p -> ns.take(k) }
  }

  private def run(c: Seq[(Long, Seq[Float])], k: Int, rounds: Int,
                  descentK: Int = 0) =
    KnnGraph.nnDescent(c.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")
          .as("embedding")), k, rounds, descentK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("matches the literal replay bit-for-bit (k rows per point, ranked)") {
    val c = corpus(5L, 120, 8)
    val got = run(c, 4, 2)
    assert(got.length === 120 * 4)
    val exp = replay(c, 4, 2)
    got.groupBy(_._1).foreach { case (p, rows) =>
      val mine = rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(rows.sortBy(_._4).map(_._4).toSeq === (1L to 4L),
        s"ranks of $p")
      assert(mine === exp(p), s"neighbor list of $p")
    }
  }

  test("block-local scoring ≡ broadcast scoring, bit for bit (r13)") {
    // the beyond-broadcast grid path is a join STRATEGY, never a
    // semantics change: force each path on the same corpus and compare
    // the full ranked output — dots are deterministic doubles, so
    // equality is exact. b lands at the floor of 2 blocks (4 cells) on
    // this tiny corpus; KnnGraph caps b at 1024 at the other end.
    val c = corpus(91L, 150, 8)
    def forced(mode: String) = {
      spark.conf.set("spark.graft.knn.scoring", mode)
      try run(c, 4, 2, descentK = 8).sortBy(r => (r._1, r._4)).toSeq
      finally spark.conf.unset("spark.graft.knn.scoring")
    }
    val viaBroadcast = forced("broadcast")
    val viaBlock = forced("block")
    assert(viaBlock === viaBroadcast)
    // and both are the literal replay
    val exp = replay(c, 4, 2, descentK = 8)
    viaBlock.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.sortBy(_._4).map(r => (r._2, r._3)) === exp(p),
        s"neighbor list of $p")
    }
  }

  test("null embeddings: block path ≡ broadcast path (r14 ADVICE — the " +
      "kind-2 branch must yield null dots, not NPE)") {
    // a null corpus embedding flows to blockScore as a null fragment
    // value: pre-r14 `pe.length` threw and killed the whole build in
    // exactly the beyond-broadcast regime; DotProduct.nullSafeEval (the
    // broadcast path) yields a null dot for the same input. Force both
    // paths on the same corpus and compare the full output.
    val c = corpus(77L, 120, 8)
    val rows = c.map { case (id, e) =>
      (id, if (id == 57L) null else e) }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    def forced(mode: String) = {
      spark.conf.set("spark.graft.knn.scoring", mode)
      try KnnGraph.nnDescent(df, 4, 2, 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getLong(3)))
        .sortBy(r => (r._1, r._4)).toSeq
      finally spark.conf.unset("spark.graft.knn.scoring")
    }
    val viaBroadcast = forced("broadcast")
    val viaBlock = forced("block")
    assert(viaBlock === viaBroadcast)
    // the null row never ranks as a NEIGHBOR of a healthy point (its
    // dots are null and trim last behind 4 real candidates)
    assert(!viaBlock.exists(r => r._1 != 57L && r._2 == 57L),
      "null-embedding row ranked as a neighbor")
  }

  test("exploration degree > k: descends at descentK, outputs top-k") {
    val c = corpus(31L, 100, 6)
    val got = run(c, 3, 2, descentK = 9)
    assert(got.length === 100 * 3)
    val exp = replay(c, 3, 2, descentK = 9)
    got.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq === exp(p),
        s"neighbor list of $p")
    }
    // and it genuinely differs from descending at k (the wider frontier
    // finds neighbors the narrow one cannot)
    val narrow = run(c, 3, 2).map(r => (r._1, r._2)).toSet
    assert(got.map(r => (r._1, r._2)).toSet !== narrow)
  }

  private def recallAt5K(c: Seq[(Long, Seq[Float])], rounds: Int,
                         descentK: Int): Double = {
    val emb = c.toMap
    val exact: Map[Long, Set[Long]] = c.map { case (i, _) =>
      i -> c.filter(_._1 != i)
        .map { case (j, _) => (j, dot(emb(i), emb(j))) }
        .sortBy { case (q, d) => (-d, q) }.take(5).map(_._1).toSet
    }.toMap
    val got = run(c, descentK, rounds).filter(_._4 <= 5).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    c.map { case (i, _) =>
      (got.getOrElse(i, Set.empty[Long]) & exact(i)).size.toDouble / 5 }
      .sum / c.size
  }

  private def recallAt5(c: Seq[(Long, Seq[Float])], rounds: Int): Double = {
    val emb = c.toMap
    val exact: Map[Long, Set[Long]] = c.map { case (i, _) =>
      i -> c.filter(_._1 != i)
        .map { case (j, _) => (j, dot(emb(i), emb(j))) }
        .sortBy { case (q, d) => (-d, q) }.take(5).map(_._1).toSet
    }.toMap
    val got = run(c, 5, rounds).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    c.map { case (i, _) =>
      (got.getOrElse(i, Set.empty[Long]) & exact(i)).size.toDouble / 5 }
      .sum / c.size
  }

  test("recall climbs with rounds; clustered corpora clear a real floor") {
    // uniform random vectors are NN-Descent's WORST case (no
    // neighborhood structure to exploit — a neighbor's neighbors are
    // barely better than random draws), so the uniform assertion is
    // only monotonicity. Real embedding corpora are clustered, which
    // is exactly the structure the descent rides: there the floor is
    // meaningful.
    val uniform = corpus(9L, 200, 8)
    val (u0, u2) = (recallAt5(uniform, 0), recallAt5(uniform, 2))
    assert(u2 > u0, s"recall must improve: rounds0=$u0 rounds2=$u2")
    val rnd = new scala.util.Random(33L)
    val centers = Seq.fill(10)(Seq.fill(8)(rnd.nextFloat() * 4 - 2))
    val clustered = (0 until 200).map { i =>
      val ctr = centers(rnd.nextInt(10))
      (i.toLong, ctr.map(v => (v + (rnd.nextFloat() - 0.5f) * 0.2f).toFloat))
    }
    // the driver query's parameters: degree 15, 3 rounds (measured
    // 0.995 here; degree 5 alone needs ~6 rounds to reach 0.73 —
    // percolation scales with degree², the scaladoc's trade)
    val c2 = recallAt5K(clustered, 3, 15)
    assert(c2 >= 0.9, s"clustered recall@5 (descentK=15, 3 rounds): $c2")
  }

  test("sparse ids work (scale corpora re-key with strides); guards loud") {
    // the contract: sparse ids are first-class (the bucketed ring
    // never assumes density) — pinned as exact parity with the replay
    // under the same stride-147 ids
    val rnd = new scala.util.Random(41L)
    val sparse = (0 until 90).map(i =>
      (i.toLong * 147 + 13, Seq.fill(6)(rnd.nextFloat() - 0.5f)))
    val got = run(sparse, 3, 2)
    val exp = replay(sparse, 3, 2)
    got.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq === exp(p)) }
    // duplicate ids reject loud (they would make ranks nondeterministic)
    val dup = Seq((1L, Seq(1f, 2f)), (1L, Seq(2f, 1f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(intercept[IllegalArgumentException](
      KnnGraph.nnDescent(dup, 1, 1)).getMessage.contains("distinct"))
    val tiny = corpus(1L, 3, 4)
    assert(intercept[IllegalArgumentException](
      run(tiny, 3, 1)).getMessage.contains("more than descentK"))
    val c = corpus(21L, 80, 6)
    val a = run(c, 3, 2).sortBy(r => (r._1, r._4)).toSeq
    (1 to 2).foreach(_ =>
      assert(run(c, 3, 2).sortBy(r => (r._1, r._4)).toSeq === a))
  }
}
