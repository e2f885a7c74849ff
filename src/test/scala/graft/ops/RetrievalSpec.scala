package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "a b"),
      (1L, "a a b b"),
      (2L, "c c"),
      (3L, "b c")
    ).toDF("doc_id", "text")
  }

  test("bm25 matches the pinned-order double computation exactly") {
    val rows = Retrieval.bm25(docs, Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay the documented formula in the same association order
    val n = 4.0; val df = 2.0; val avgdl = (2.0 + 4.0 + 2.0 + 2.0) / 4L
    val idf = (n - df + 0.5) / (df + 0.5)
    def cq(tf: Long, dl: Long): Long = {
      val sat = (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
      math.floor(idf * sat * 1000000.0).toLong
    }
    assert(rows === Map(0L -> cq(1, 2), 1L -> cq(2, 4)))
    // docs without any query term never appear
    assert(!rows.contains(2L) && !rows.contains(3L))
  }

  test("bm25 multi-term contributions sum per doc; rarer terms weigh more") {
    val rows = Retrieval.bm25(docs, Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L))
    // doc2 (two hits of 'c', short) must beat doc3 (one hit of 'c')
    assert(rows(2L) > rows(3L))
  }

  test("topKRanked equals the global-window rank, without a global sort") {
    import spark.implicits._
    val df = spark.range(0, 100).toDF("doc_id")
      .withColumn("score_q", (col("doc_id") * 37L) % 101L)
    val got = Retrieval.topKRanked(df, 7,
        col("score_q").desc, col("doc_id").asc)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.take(7)
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
    assert(got.toSeq === want.toSeq)
    // the plan is TakeOrderedAndProject — never a global Sort + window
    val plan = Retrieval.topKRanked(df, 7,
      col("score_q").desc, col("doc_id").asc)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("rrfFuse: shared docs sum both reciprocal ranks; singles keep one") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L)).toDF("doc_id", "rnk")
    val b = Seq((20L, 1L), (30L, 2L)).toDF("doc_id", "rnk")
    val got = Retrieval.rrfFuse(a, b, 3, c = 60)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got(0) === ((20L, 1.0 / 62 + 1.0 / 61, 1L))) // in both lists
    assert(got(1) === ((10L, 1.0 / 61, 2L)))
    assert(got(2) === ((30L, 1.0 / 62, 3L)))
  }

  test("bm25 is deterministic across repartitionings (long-quantized sums)") {
    val once = Retrieval.bm25(docs, Seq("a", "b", "c")).collect()
      .map(_.toSeq).toSet
    val again = Retrieval.bm25(docs.repartition(7), Seq("a", "b", "c"))
      .collect().map(_.toSeq).toSet
    assert(once === again)
  }
}
