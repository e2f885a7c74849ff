package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import Sessionize._

  test("streaming sessions equal the batch-window sessionization") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = graft.queries.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts")).as[Ev].collect()

    val source = MemoryStream[Ev]
    val q = sessions(source.toDS())
      .writeStream.format("memory").queryName("sess_par").outputMode("append").start()
    try { source.addData(evs.toIndexedSeq); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sess_par")
      .as[Session].collect().toSet

    // streaming emits only CLOSED sessions; batch sees them all. Every
    // streamed session must appear verbatim in the batch result, and the
    // missing ones must be exactly each user's final (still-open) session.
    val batch = sessionsBatch(spark, sfDir).collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed sessions not in batch: ${(streamed -- batch).take(3)}")
    val open = batch -- streamed
    val lastPerUser = batch.groupBy(_.user_id).view
      .mapValues(_.maxBy(_.session_end)).values.toSet
    assert(open == lastPerUser.filter(open.contains) ||
           open.subsetOf(lastPerUser),
      s"unexpected non-final open sessions: ${(open -- lastPerUser).take(3)}")
  }

  test("incremental feeding across batches preserves session continuity") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // one user, three events 1ns apart fed in two micro-batches: must
    // remain ONE session (state carries across batches), closed by a
    // fourth event far in the future.
    val g = DefaultGapNs
    val source = MemoryStream[Ev]
    val q = sessions(source.toDS())
      .writeStream.format("memory").queryName("sess_inc").outputMode("append").start()
    try {
      source.addData(Ev(7L, 100L), Ev(7L, 101L)); q.processAllAvailable()
      source.addData(Ev(7L, 102L)); q.processAllAvailable()
      source.addData(Ev(7L, 102L + 2 * g)); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess_inc").as[Session].collect().toList
    assert(out == List(Session(7L, 100L, 102L, 3L)), out.toString)
  }

  test("approx_count_distinct tracks exact distinct within documented rsd") {
    // the sketch twin of q_distinct_agg (engine-specific, so asserted
    // here instead of the DuckDB oracle)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val r = orders.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
