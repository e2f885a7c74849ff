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
}
