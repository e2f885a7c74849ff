package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Absolute-version reads and timestamp time travel
  * (LineageTable.asOfVersion, Catalog.commitAt/asOfTimestamp). */
class TimeTravelSpec extends SparkSpec {

  import spark.implicits._

  private def base =
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")

  private def freshCatalog(autoCompact: Boolean = false): (Catalog, String) = {
    val wh = Files.createTempDirectory("graft_tt_wh_").toString
    (new Catalog(spark, wh, autoCompact = autoCompact), wh)
  }

  test("asOfVersion addresses table states; later inserts are absent") {
    val t = LineageTable.fromBase("k", base)          // ver 0
      .update(col("k") === 1L, Map("v" -> lit(11L)))  // ver 1
      .insert(Seq((9L, 90L)).toDF("k", "v"))          // ver 2
      .delete(col("k") === 2L)                        // ver 3
    def snapAt(v: Long) =
      t.asOfVersion(v).collect().map(_.toSeq).toSet
    assert(snapAt(0L) === Set(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)))
    assert(snapAt(1L) === Set(Seq(1L, 11L), Seq(2L, 20L), Seq(3L, 30L)))
    assert(snapAt(2L) === Set(Seq(1L, 11L), Seq(2L, 20L), Seq(3L, 30L),
      Seq(9L, 90L)))
    assert(snapAt(3L) === Set(Seq(1L, 11L), Seq(3L, 30L), Seq(9L, 90L)))
    // beyond the newest stamp ≡ latest
    assert(snapAt(99L) === snapAt(3L))
  }

  test("asOfTimestamp resolves through the commit log, clamping at base") {
    val (cat, wh) = freshCatalog()
    cat.createTable("t", "k", base)
    cat.commitAt("t", Txn.empty.update(col("k") === 1L, Map("v" -> lit(11L))),
      ts = 1000L)
    cat.commitAt("t", Txn.empty.delete(col("k") === 2L), ts = 2000L)
    def at(ts: Long) =
      cat.asOfTimestamp("t", ts).collect().map(_.toSeq).toSet
    assert(at(500L) === Set(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)),
      "before the first logged commit → base state")
    assert(at(1000L) === Set(Seq(1L, 11L), Seq(2L, 20L), Seq(3L, 30L)),
      "at-or-after a commit's ts sees that commit")
    assert(at(1500L) === at(1000L))
    assert(at(5000L) === Set(Seq(1L, 11L), Seq(3L, 30L)))
    // the log is durable metadata: a fresh catalog over the same dir agrees
    val reopened = new Catalog(spark, wh, autoCompact = false)
    assert(reopened.asOfTimestamp("t", 1500L).collect().map(_.toSeq).toSet
      === at(1500L))
  }

  test("out-of-order commit timestamps are rejected before writing") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    cat.commitAt("t", Txn.empty.update(col("k") === 1L, Map("v" -> lit(11L))),
      ts = 1000L)
    intercept[IllegalArgumentException] {
      cat.commitAt("t", Txn.empty.delete(col("k") === 2L), ts = 999L)
    }
    // the rejected commit wrote nothing
    assert(cat.getTable("t").snapshot.count() === 3L)
  }

  test("physical rewrites clear the log: travel is bounded by compaction") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    cat.commitAt("t", Txn.empty.update(col("k") === 1L, Map("v" -> lit(11L))),
      ts = 1000L)
    cat.foldTail("t") // history-preserving merge — but stamps are rewritten
    // the pre-compaction ts now resolves to the post-rewrite base state
    // (= latest), never to a wrong mixture of re-stamped rows
    assert(cat.asOfTimestamp("t", 500L).collect().map(_.toSeq).toSet ===
      cat.getTable("t").snapshot.collect().map(_.toSeq).toSet)
  }
}
