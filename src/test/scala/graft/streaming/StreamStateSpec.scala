package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.SparkSpec
import graft.ops.Dedup

/**
 * State-bounding semantics of the TTL dedup ([[Dedup.exactFirstWithinTtl]]
 * / driver query `stream_dedup_ttl`): a hash's state row must be EVICTED
 * once the event-time watermark passes its arrival + TTL — the property
 * that keeps streaming-dedup state bounded by the TTL window instead of
 * growing with every distinct hash forever (the complete-mode
 * `stream_dedup` trade documented on both operators).
 */
class StreamStateSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ets", TimestampType)))

  test("TTL dedup evicts state past the watermark; keeps it within") {
    val in = Files.createTempDirectory("graft_ttl_in_").toString
    val out = Files.createTempDirectory("graft_ttl_out_").toString
    val t0 = 1704067200000000L // µs

    def arrive(rows: (Long, String, Long)*): Unit = {
      import spark.implicits._
      rows.toSeq.toDF("doc_id", "text", "us")
        .withColumn("ets", timestamp_micros(col("us"))).drop("us")
        .select(col("doc_id"), col("text"), col("ets"))
        .write.mode("append").parquet(in)
    }

    // one bounded drain per arrival wave, resuming the SAME checkpoint —
    // exactly how a periodic incremental dedup job deploys; state
    // persists in the checkpoint between drains
    def drainOnce(): Unit = StreamOps.drainToParquet(spark,
      Dedup.exactFirstWithinTtl(
        spark.readStream.schema(schema).parquet(in), "ets", "1 hour")
        .select(col("h"), col("doc_id")), out)

    def emitted(text: String): Long = {
      import spark.implicits._
      val h = Seq(text).toDF("t").select(md5(col("t"))).head.getString(0)
      spark.read.parquet(out).where(col("h") === h).count()
    }

    // wave 1: two distinct texts → both emit, both enter state
    arrive((1L, "aaa", t0), (2L, "bbb", t0 + 10L * 1000000))
    drainOnce()
    assert(emitted("aaa") === 1 && emitted("bbb") === 1)

    // wave 2: within-TTL duplicate of bbb (event 30min later, TTL 1h) →
    // DROPPED against live state; ccc is new and advances the watermark
    // to t0+3h−1h = t0+2h, past aaa's t0+1h expiry → aaa's state row
    // is evicted at this batch's commit
    arrive((3L, "bbb", t0 + 1800L * 1000000),
           (4L, "ccc", t0 + 10800L * 1000000))
    drainOnce()
    assert(emitted("bbb") === 1, "within-TTL duplicate must be dropped")
    assert(emitted("ccc") === 1)

    // wave 3: duplicate of aaa AFTER its state was evicted → RE-EMITTED
    // (the observable proof the state row is gone — bounded state is
    // exactly this trade); ccc's state (stored t0+3h, watermark t0+2h)
    // is still live, so its duplicate stays dropped
    arrive((5L, "aaa", t0 + 10810L * 1000000),
           (6L, "ccc", t0 + 10820L * 1000000))
    drainOnce()
    assert(emitted("aaa") === 2,
      "duplicate past the TTL must re-emit: state was not evicted")
    assert(emitted("ccc") === 1, "within-TTL duplicate must stay dropped")
  }

  test("streaming KMV sketch merges across micro-batches ≡ one batch") {
    import spark.implicits._
    import graft.functions.{KMinValues, Md5HighBits}
    // three files → forced separate micro-batches; values overlap across
    // batches so the bounded set-union merge (not mere concatenation) is
    // what's exercised
    val in = Files.createTempDirectory("graft_sndv_in_").toString
    Seq(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L), Seq(1L, 6L, 7L))
      .foreach(vs => vs.toDF("x").coalesce(1).write.mode("append").parquet(in))
    val sch = StructType(Seq(StructField("x", LongType)))
    val h = Md5HighBits.hash60(col("x").cast("string"))
    val plan = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .select(h.as("h"))
      .agg(KMinValues.kMinValues(col("h"), 4).as("kmv"))
    val streamed = StreamOps.drainComplete(spark, plan)
      .head().getSeq[Long](0)
    val batch = spark.read.parquet(in).select(h.as("h"))
      .agg(KMinValues.kMinValues(col("h"), 4)).head().getSeq[Long](0)
    assert(streamed === batch)
    assert(streamed.length === 4) // 7 distinct values, k=4 → full sketch
  }

  test("streaming histogram quantile: multi-batch ≡ one batch, bound holds") {
    import spark.implicits._
    // the stream_quantile shape: incremental fixed-bin bucket counts
    // (state = one counter per occupied bucket), three files forced into
    // separate micro-batches so the state MERGE is what's exercised
    val in = Files.createTempDirectory("graft_sq_in_").toString
    val vals = (0 until 100).map(i => (i * 7919 % 100).toDouble + 0.5)
    vals.grouped(34).foreach(g =>
      g.toDF("v").coalesce(1).write.mode("append").parquet(in))
    val sch = StructType(Seq(StructField("v",
      org.apache.spark.sql.types.DoubleType)))
    val width = 10.0
    val plan = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .select(floor(col("v") / width).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val streamed = StreamOps.drainComplete(spark, plan)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = spark.read.parquet(in)
      .select(floor(col("v") / width).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    // the quantile read off the histogram BRACKETS the exact value: the
    // first bucket whose cumulative crosses ceil(q·n) contains the true
    // rank-ceil(q·n) element — the bounded-error contract stream_quantile
    // documents (error ≤ one bucket width)
    val n = vals.size
    val sorted = vals.sorted
    Seq(0.5, 0.95).foreach { q =>
      val rank = math.ceil(q * n).toLong
      val bucket = streamed.toSeq.sortBy(_._1)
        .scanLeft((Long.MinValue, 0L)) { case ((_, cum), (b, c)) => (b, cum + c) }
        .find(_._2 >= rank).get._1
      val exact = sorted((rank - 1).toInt)
      assert(exact >= bucket * width && exact < (bucket + 1) * width,
        s"q=$q: exact $exact outside bucket [${bucket * width}, ...)")
    }
  }
}
