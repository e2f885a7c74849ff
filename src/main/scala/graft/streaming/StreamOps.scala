package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/**
 * Shared Structured-Streaming harness: a file source over one table of the
 * sf directory, and a drain-to-table runner. The point of the engine's
 * streaming surface is that the SAME operator plan runs batch or
 * incremental — these helpers supply the incremental halves.
 *
 * Scale: the file source lists and reads parquet incrementally (a
 * directory watch in production — new files become micro-batches); nothing
 * is ever materialized on the driver. Trigger.AvailableNow drains what is
 * currently visible, checkpoints, and stops — the streaming analog of a
 * bounded batch run, and exactly how periodic incremental jobs deploy.
 */
object StreamOps {

  private val sinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Incremental source over `<sfDir>/<table>.parquet` (schema inferred
    * from a batch peek — production would pass it explicitly). Handles
    * both shapes a parquet table takes: a single file (driver testdata)
    * and a directory of part files (Spark-written, e.g. ScaleData
    * output). The distinction matters: `pathGlobFilter` matches LEAF file
    * names only, so globbing for `table.parquet` over a directory-shaped
    * table silently yields an EMPTY stream — every part file is named
    * part-*.parquet. */
  def fileSource(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val path = s"$sfDir/$table.parquet"
    val schema = spark.read.parquet(path).schema
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
      spark.readStream.schema(schema).parquet(path)
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$table.parquet")
        .parquet(sfDir)
  }

  /** Run a streaming aggregation to completion over the currently-visible
    * input and return the result table (memory sink, complete mode). */
  def drainComplete(spark: SparkSession, plan: DataFrame): DataFrame =
    drain(spark, plan, "complete")

  /** Same, append mode — for stateful operators (flatMapGroupsWithState)
    * that emit rows incrementally rather than maintaining a result table. */
  def drainAppend(spark: SparkSession, plan: DataFrame): DataFrame =
    drain(spark, plan, "append")

  private def drain(spark: SparkSession, plan: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${sinkId.incrementAndGet()}"
    val query = plan.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    try query.awaitTermination() finally query.stop()
    // Copy the result OFF the memory sink (executor blocks, droppable by
    // GC once the caller lets go) and drop the sink's temp view: the sink
    // otherwise pins every emitted row in the driver for the session's
    // lifetime — at the 100× SF a 9.4M-row session table per drain, which
    // measurably slowed every query that ran after it.
    val out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** Production-shaped sink: drain the stream to an exactly-once parquet
    * directory sink (append mode — the mode file sinks support) with its
    * checkpoint alongside. Re-running with the same checkpoint resumes
    * instead of duplicating — the durability half of the streaming story;
    * the memory-sink drains above exist only to hand query results back
    * to the driver contract. */
  def drainToParquet(spark: SparkSession, plan: DataFrame, outDir: String): Unit = {
    val query = plan.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try query.awaitTermination() finally query.stop()
  }
}
