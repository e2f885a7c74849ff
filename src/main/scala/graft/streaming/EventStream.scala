package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * Structured Streaming surface (SURVEY.md §2 #41): watermarked tumbling-
 * window aggregation over the events stream. The transformation is ONE
 * shared plan — `windowAgg` — applied to either a batch DataFrame
 * (OlapQueries.q_events_window computes the identical result with integer
 * window arithmetic) or a streaming source; Spark's incrementalization is
 * what changes, not the query.
 */
object EventStream {

  case class Event(event_id: Long, ts: Long, event_type: String, value: Double)

  private val sinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /**
   * Watermark + 1h tumbling window + exact-decimal aggregation. `ts` is
   * nanos-since-epoch (long); converted to a proper timestamp for the
   * watermark/window machinery (micro truncation cannot move an hour
   * boundary). Output window start is re-expressed in nanos so batch,
   * stream, and DuckDB oracle agree on an integer column.
   */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("ts_t", "2 hours")
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select((unix_micros(col("window.start")) * 1000L).as("window_start_ns"),
              col("event_type"), col("n"), col("sum_value"))

  /**
   * Batch-parity harness: feed the batch events table through a
   * MemoryStream into the streaming plan and return the sink table.
   * The driver-side collect here feeds the in-memory SOURCE (a test
   * harness stand-in for Kafka/files); the aggregation itself runs
   * distributed inside the streaming query.
   */
  def runBatchParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect()
    val source = MemoryStream[Event]
    val name = s"graft_stream_${sinkId.incrementAndGet()}"
    val query = windowAgg(source.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      source.addData(rows.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()
    spark.table(name)
  }
}
