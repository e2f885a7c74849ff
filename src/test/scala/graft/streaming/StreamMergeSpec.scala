package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpec
import graft.core.{Catalog, LineageTable}

/** Streaming CDC apply (StreamOps.mergeStream): one durable MERGE INTO
  * commit per micro-batch, final state independent of the batch split. */
class StreamMergeSpec extends SparkSpec {

  import spark.implicits._

  test("multi-batch stream merge equals one batch merge of the union") {
    // three change files → maxFilesPerTrigger=1 forces three micro-batches
    val srcDir = Files.createTempDirectory("graft_sm_src_").toString
    Seq(
      Seq((1L, 11L, "X"), (2L, 22L, "X")),
      Seq((3L, 33L, "X"), (9L, 99L, "I")), // 9 = not-matched insert arm
      Seq((4L, 44L, "X"))
    ).foreach(rows =>
      rows.toDF("k", "v", "s").coalesce(1).write.mode("append").parquet(srcDir))

    val base = Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C"),
      (4L, 40L, "D")).toDF("k", "v", "s")
    val wh = Files.createTempDirectory("graft_sm_wh_").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("t", "k", base)

    val schema = new StructType()
      .add("k", LongType).add("v", LongType).add("s", StringType)
    val changes = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    StreamOps.mergeStream(spark, changes, cat, "t", Seq("v", "s"))

    // the batches really were separate durable commits: each merge is one
    // op, so the newest stamp counts them
    val maxVer = cat.getTable("t").lineage
      .agg(org.apache.spark.sql.functions.max("_ver")).head().getLong(0)
    assert(maxVer >= 3L, "expected one catalog commit per micro-batch")

    val viaStream = cat.getTable("t").snapshot.collect().map(_.toSeq).toSet
    val allChanges = Seq((1L, 11L, "X"), (2L, 22L, "X"), (3L, 33L, "X"),
      (9L, 99L, "I"), (4L, 44L, "X")).toDF("k", "v", "s")
    val oneMerge = LineageTable.fromBase("k", base)
      .mergeInto(allChanges, Seq("v", "s"))
      .snapshot.collect().map(_.toSeq).toSet
    assert(viaStream === oneMerge)
  }

  test("a replayed micro-batch is a no-op: delete-arm keys stay deleted") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_sm_replay_").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("t", "k",
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "s"))
    val txn = graft.core.Txn.empty.mergeInto(
      Seq((2L, 0L, "del")).toDF("k", "v", "s"), Seq("v", "s"),
      deleteWhen = Some(col("s") === "del"))
    def liveKeys = cat.getTable("t").snapshot.select("k")
      .collect().map(_.getLong(0)).toSet
    cat.commitStreamBatch("t", txn, "w1", 0L)
    assert(liveKeys === Set(1L))
    // foreachBatch is at-least-once: the SAME batch retried after a
    // crash-between-commit-and-checkpoint must be SKIPPED — a blind
    // re-apply would find key 2 unmatched and resurrect it via the
    // not-matched insert arm
    cat.commitStreamBatch("t", txn, "w1", 0L)
    assert(liveKeys === Set(1L), "replayed batch was re-applied")
    // a LATER batch from the same writer still applies
    cat.commitStreamBatch("t", graft.core.Txn.empty.insert(
      Seq((9L, 90L, "I")).toDF("k", "v", "s")), "w1", 1L)
    assert(liveKeys === Set(1L, 9L))
    // batch ids are per-writer: a NEW writer (fresh drain/checkpoint,
    // ids restart at 0) is never mistaken for a replay
    cat.commitStreamBatch("t", graft.core.Txn.empty.insert(
      Seq((8L, 80L, "J")).toDF("k", "v", "s")), "w2", 0L)
    assert(liveKeys === Set(1L, 8L, 9L))
  }

  test("interleaved writers: each keeps its own replay slot (per-writer map)") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_sm_two_writers_").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("t", "k",
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "s"))
    def liveKeys = cat.getTable("t").snapshot.select("k")
      .collect().map(_.getLong(0)).toSet
    // writer A applies a delete-arm batch...
    val delTxn = graft.core.Txn.empty.mergeInto(
      Seq((2L, 0L, "del")).toDF("k", "v", "s"), Seq("v", "s"),
      deleteWhen = Some(col("s") === "del"))
    cat.commitStreamBatch("t", delTxn, "wA", 0L)
    assert(liveKeys === Set(1L))
    // ...then writer B commits in between (with a single replay slot, B's
    // commit would overwrite A's record)...
    cat.commitStreamBatch("t", graft.core.Txn.empty.insert(
      Seq((7L, 70L, "I")).toDF("k", "v", "s")), "wB", 0L)
    assert(liveKeys === Set(1L, 7L))
    // ...and A's at-least-once RETRY of its already-applied batch must
    // STILL be skipped — a re-apply would resurrect key 2 via the
    // not-matched insert arm
    cat.commitStreamBatch("t", delTxn, "wA", 0L)
    assert(liveKeys === Set(1L, 7L), "writer A's replay was re-applied " +
      "after writer B's interleaved commit clobbered its slot")
    // both writers continue independently
    cat.commitStreamBatch("t", graft.core.Txn.empty.insert(
      Seq((8L, 80L, "J")).toDF("k", "v", "s")), "wA", 1L)
    cat.commitStreamBatch("t", graft.core.Txn.empty.insert(
      Seq((9L, 90L, "K")).toDF("k", "v", "s")), "wB", 1L)
    assert(liveKeys === Set(1L, 7L, 8L, 9L))
    // and the map survives a reopen (it rides the durable metadata)
    val cat2 = new Catalog(spark, wh)
    cat2.commitStreamBatch("t", delTxn, "wA", 0L)
    assert(liveKeys === Set(1L, 7L, 8L, 9L),
      "replay skip must survive a catalog reopen")
  }

  test("mergeStream restart with a durable checkpoint resumes, never replays") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_sm_restart_").toString
    val srcDir = Files.createTempDirectory("graft_sm_restart_src_").toString
    val ckpt = Files.createTempDirectory("graft_sm_restart_ckpt_").toString + "/ckpt"
    val cat = new Catalog(spark, wh)
    cat.createTable("t", "k",
      Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C")).toDF("k", "v", "s"))
    def liveRows = cat.getTable("t").snapshot
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // first drain: one change file (update k=1, delete k=2)
    Seq((1L, 11L, "upd"), (2L, 0L, "del")).toDF("k", "v", "s")
      .write.mode("append").json(srcDir)
    val src1 = spark.readStream
      .schema(Seq((0L, 0L, "")).toDF("k", "v", "s").schema).json(srcDir)
    StreamOps.mergeStream(spark, src1, cat, "t", Seq("v", "s"),
      deleteWhen = Some(col("s") === "del"), checkpoint = Some(ckpt))
    assert(liveRows === Map(1L -> 11L, 3L -> 30L))
    // "restart": a second invocation with the SAME checkpoint must
    // consume only files arriving after the first drain — the already-
    // applied delete-arm file is not replayed (same writer id, offsets
    // resumed), so key 2 stays dead
    Seq((3L, 33L, "upd")).toDF("k", "v", "s")
      .write.mode("append").json(srcDir)
    val src2 = spark.readStream
      .schema(Seq((0L, 0L, "")).toDF("k", "v", "s").schema).json(srcDir)
    StreamOps.mergeStream(spark, src2, cat, "t", Seq("v", "s"),
      deleteWhen = Some(col("s") === "del"), checkpoint = Some(ckpt))
    assert(liveRows === Map(1L -> 11L, 3L -> 33L),
      "restart replayed consumed changes or resurrected a deleted key")
  }

  test("refreshIndex=true keeps the IVF-PQ index in lockstep with streamed ingest") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_sm_idx_wh_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    cat.createTable("t", "vec_id", emb.where(col("vec_id") < 300))
    cat.createIvfPqIndex("t", "embedding", nCentroids = 8, m = 4,
      codebookSize = 4)

    // three arrival files → maxFilesPerTrigger=1 → three micro-batches,
    // each one durable commit + one incremental index refresh
    val srcDir = Files.createTempDirectory("graft_sm_idx_src_").toString
    (0 until 3).foreach(i =>
      emb.where(col("vec_id") >= 300 && col("vec_id") % 3 === i)
        .coalesce(1).write.mode("append").parquet(srcDir))
    val changes = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    StreamOps.mergeStream(spark, changes, cat, "t", Seq("embedding"),
      refreshIndex = true)

    val Some((_, builtSeq, _, _, codes)) = cat.ivfPqIndex("t")
    val maxVer = cat.getTable("t").lineage
      .agg(org.apache.spark.sql.functions.max("_ver")).head().getLong(0)
    assert(maxVer >= 3L, "one commit per micro-batch")
    assert(builtSeq === maxVer, "index not caught up to the last commit")
    assert(codes.count() === emb.count(),
      "every streamed vector must be coded")
  }
}
