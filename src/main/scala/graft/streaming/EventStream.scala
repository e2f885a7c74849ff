package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming surface (SURVEY.md §2 #41): watermarked tumbling-
 * window aggregation over the events stream. The transformation is ONE
 * shared plan — `windowAgg` — applied to either a batch DataFrame
 * (OlapQueries.q_events_window computes the identical result with integer
 * window arithmetic) or a streaming source; Spark's incrementalization is
 * what changes, not the query.
 */
object EventStream {

  /**
   * Watermark + 1h tumbling window + exact-decimal aggregation. `ts` is
   * nanos-since-epoch (long); converted to a proper timestamp for the
   * watermark/window machinery via INTEGER division (`ts div 1000` — plain
   * `/` is double division, and 2024-era nano timestamps ~1.7e18 exceed
   * double's 53-bit mantissa, so an event within ~256 ns of an hour
   * boundary could round into the wrong window; integer truncation cannot
   * move a boundary). Output window start is re-expressed in nanos so
   * batch, stream, and DuckDB oracle agree on an integer column.
   */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_t", "2 hours")
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           graft.functions.Exact.sumMoney(col("value")).as("sum_value"))
      .select((unix_micros(col("window.start")) * 1000L).as("window_start_ns"),
              col("event_type"), col("n"), col("sum_value"))

  /**
   * Batch-parity harness: run the streaming plan over a FILE source — the
   * events parquet is read incrementally by the FileStreamSource exactly
   * as a production directory-watching deployment would, so nothing is
   * ever materialized on the driver and the source scales to any event
   * volume (the r1 MemoryStream harness collected the whole table to the
   * driver to feed the source; the aggregation plan is unchanged).
   * Trigger.AvailableNow drains all currently-visible files, checkpoints,
   * and stops — the streaming analog of a bounded batch run.
   */
  def runBatchParity(spark: SparkSession, sfDir: String): DataFrame = {
    val source = StreamOps.fileSource(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    StreamOps.drainComplete(spark, windowAgg(source))
  }
}
