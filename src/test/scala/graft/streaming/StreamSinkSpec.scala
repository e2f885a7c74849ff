package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamSinkSpec extends SparkSpec {

  test("parquet file sink drains the stream exactly once and resumes idle") {
    val out = Files.createTempDirectory("graft_sink_").toString
    val src = StreamOps.fileSource(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("value"))
    StreamOps.drainToParquet(spark, src, out)
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val sunk = spark.read.parquet(out)
    assert(sunk.count() === batch.count())
    // resuming with the same checkpoint sees no new files: no duplicates
    StreamOps.drainToParquet(spark, StreamOps.fileSource(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("value")), out)
    assert(spark.read.parquet(out).count() === batch.count())
    // the sunk rows are the same multiset, not just the same count
    assert(spark.read.parquet(out).select(col("event_id"))
      .exceptAll(batch.select(col("event_id"))).isEmpty)
  }

  test("sink resumes over files that arrived between drains, exactly once") {
    // continuous-ingestion shape: drain, new files land, drain again —
    // the checkpoint must advance past old files and pick up ONLY the new
    val in = Files.createTempDirectory("graft_arrive_in_").toString
    val out = Files.createTempDirectory("graft_arrive_out_").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("value"))
    events.where(col("event_id") % 2 === 0).write
      .mode("append").parquet(in)
    def drain(): Unit = StreamOps.drainToParquet(spark,
      spark.readStream.schema(events.schema).parquet(in), out)
    drain()
    val half = spark.read.parquet(out).count()
    assert(half === events.where(col("event_id") % 2 === 0).count())
    // second half arrives as NEW files in the same directory
    events.where(col("event_id") % 2 === 1).write
      .mode("append").parquet(in)
    drain()
    val sunk = spark.read.parquet(out)
    assert(sunk.count() === events.count(), "missed or duplicated arrivals")
    assert(sunk.select(col("event_id"))
      .exceptAll(events.select(col("event_id"))).isEmpty)
  }
}
