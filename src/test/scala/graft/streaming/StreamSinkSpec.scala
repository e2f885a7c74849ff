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
}
