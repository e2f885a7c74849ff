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

  test("drains never mutate the caller session's conf (concurrent-safe)") {
    // the r4 drain mutated-and-restored spark.sql.shuffle.partitions on
    // the SHARED session — a concurrent batch query planning mid-drain
    // would pick up the drain's width. The drain now runs on a session
    // CLONE; poll the caller's conf throughout and require it never moves.
    val caller = spark.newSession()
    caller.conf.set("spark.sql.shuffle.partitions", "32")
    val observed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    @volatile var polling = true
    val poller = new Thread(() => {
      while (polling) {
        observed.add(caller.conf.get("spark.sql.shuffle.partitions"))
        Thread.sleep(5)
      }
    })
    poller.start()
    try {
      val src = StreamOps.fileSource(caller, sfDir, "events")
        .select(col("event_id"), col("event_type"))
      val counts = StreamOps.drainComplete(caller,
        src.groupBy(col("event_type")).agg(count(lit(1)).as("n")))
      // result correct AND handed back on the caller's session
      val want = caller.read.parquet(s"$sfDir/events.parquet")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
      assert(counts.collect().map(_.toSeq).toSet === want)
      assert(counts.sparkSession eq caller)
    } finally { polling = false; poller.join() }
    assert(observed.size === 1 && observed.contains("32"),
      s"caller conf mutated during drain: saw $observed")
  }

  test("drain scratch resolves through the Hadoop FS of an explicit file: URI") {
    // the drain's micro-batch spill + checkpoint must go through the
    // session's Hadoop FileSystem (like Catalog's staged writes), never
    // java.nio: a driver-local temp dir on a real cluster means each
    // executor writes its task output to its own disk and the read-back
    // sees only driver-local files. Point spark.graft.scratchDir at an
    // explicit file:-scheme URI and require the drain to (a) produce the
    // right result and (b) leave its spill under THAT root.
    val root = Files.createTempDirectory("graft_scratch_").toString
    val caller = spark.newSession()
    caller.conf.set("spark.graft.scratchDir", s"file:$root")
    val src = StreamOps.fileSource(caller, sfDir, "events")
      .select(col("event_id"), col("event_type"))
    val counts = StreamOps.drainComplete(caller,
      src.groupBy(col("event_type")).agg(count(lit(1)).as("n")))
    val want = caller.read.parquet(s"$sfDir/events.parquet")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(counts.collect().map(_.toSeq).toSet === want)
    // the spill landed under the configured root: one drain_* dir holding
    // the parquet out/ and the checkpoint
    val drains = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("drain_"))
    assert(drains.nonEmpty, s"no drain scratch under configured root $root")
    assert(drains.exists(d => new java.io.File(d, "out").isDirectory),
      "micro-batch spill not under the configured scratch root")
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
