package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpec

/**
 * Stream-stream LEFT OUTER join (r10): null-side emission timing across
 * a forced batch split. A view with no purchase emits (view, NULL) only
 * once the watermark proves no match can arrive — strictly after the
 * batch whose data advanced the watermark past (view ts + join window);
 * views inside the un-expirable tail window emit nothing. Matched rows
 * emit as matches and never re-emit as nulls.
 */
class OuterJoinSpec extends SparkSpec {

  import spark.implicits._

  test("null rows emit on watermark expiry; the tail window stays silent") {
    val srcDir = Files.createTempDirectory("graft_soj_src_").toString
    // all times sit strictly above the initial watermark (0): a row AT
    // the watermark is dropped as late on insertion and can never emit
    def us(sec: Long): Long = (1000 + sec) * 1000000L
    // file 1: an orphan view (u1), a matched view+purchase pair (u2)
    Seq(
      ("u1", 1L, "view", us(0)),
      ("u2", 2L, "view", us(100)),
      ("u2", 3L, "purchase", us(200))
    ).toDF("user_id", "event_id", "event_type", "ts_us")
      .coalesce(1).write.mode("append").parquet(srcDir)
    // file 2, much later: pushes BOTH sides' watermarks to 40000s − 2h =
    // 32800s — past u1's last match instant (0 + 7200s), not past u8's
    // (39000 + 7200s). u9 is a same-instant match at the frontier.
    Seq(
      ("u8", 8L, "view", us(39000)),
      ("u9", 9L, "view", us(40000)),
      ("u9", 10L, "purchase", us(40000))
    ).toDF("user_id", "event_id", "event_type", "ts_us")
      .coalesce(1).write.mode("append").parquet(srcDir)

    val schema = new StructType()
      .add("user_id", StringType).add("event_id", LongType)
      .add("event_type", StringType).add("ts_us", LongType)
    def side(tpe: String, idAs: String, tsAs: String) =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .where(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idAs),
          timestamp_micros(col("ts_us")).as(tsAs))
        .withWatermark(tsAs, "2 hours")
    val views = side("view", "view_id", "vts")
    val purch = side("purchase", "purchase_id", "pts")
      .withColumnRenamed("user_id", "p_user_id")
    val out = StreamOps.drainAppend(spark,
      views.join(purch,
        col("user_id") === col("p_user_id") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr("INTERVAL 2 HOURS"),
        "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(out === Set(
      ("u2", 2L, 3L),   // matched inside the window
      ("u9", 9L, 10L),  // matched at the same instant
      ("u1", 1L, -1L)), // orphan, expired by the file-2 watermark
      s"got $out")
    // u8 (39000s, inside the tail window) must NOT have emitted at all
    assert(!out.exists(_._1 == "u8"),
      "a tail-window view must stay in state, not emit a null row")
  }
}
