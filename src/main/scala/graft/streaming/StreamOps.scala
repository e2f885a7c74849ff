package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
    // foreachBatch → parquet, NOT the memory sink: the memory sink
    // collects every emitted row at the DRIVER and pins it for the
    // session's lifetime — at the 100× SF one sessionize drain held 9.4M
    // rows on the driver, its scan-back was 10× slower than a distributed
    // scan, and the heap churn measurably slowed every query after it.
    // Writing each micro-batch with the cluster and reading the files
    // back keeps the result distributed end to end (and is the shape a
    // production drain takes anyway — cf. drainToParquet).
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_drain_${sinkId.incrementAndGet()}_").toString
    val out = s"$dir/out"
    // complete mode re-emits the whole result table every batch (last
    // write wins); append mode emits disjoint increments (accumulate)
    val save = if (mode == "complete") SaveMode.Overwrite else SaveMode.Append
    // Streaming state partitioning is fixed by the FIRST micro-batch (it
    // is baked into the checkpoint), and every state partition costs
    // per-batch store commits — measured 2m32s→22s of system CPU for one
    // bounded stream-stream join drain going 32→8 partitions (4+ stores
    // per partition on a two-sided join). A bounded AvailableNow drain
    // gets a capped count; production continuous queries choose their own
    // width at query start the same way.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.min(prev.toInt, 8).toString)
    // conf restores only after the drain completes: micro-batches plan on
    // their own thread after start(), so an earlier restore would race
    try {
      val query = plan.writeStream
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/_ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode(save).parquet(out)
        }
        .start()
      try query.awaitTermination() finally query.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(out)))
      spark.read.parquet(out)
    else // a drained stream with zero batches yields an empty result
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        plan.schema)
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
