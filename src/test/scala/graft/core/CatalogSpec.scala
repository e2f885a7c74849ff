package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference Database.open/close/create/drop/get semantics over the
  * parquet warehouse (reference: lstore/db.py). */
class CatalogSpec extends SparkSpec {

  private def freshCatalog(): (Catalog, String) = {
    val wh = Files.createTempDirectory("graft_wh_").toString
    (new Catalog(spark, wh), wh)
  }

  private def base = {
    import spark.implicits._
    Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C")).toDF("k", "v", "s")
  }

  test("create → get round-trips the table through disk") {
    val (cat, _) = freshCatalog()
    cat.createTable("t1", "k", base)
    val got = cat.getTable("t1")
    assert(got.keyCol == "k")
    assert(got.dataCols == Seq("k", "v", "s"))
    assert(got.snapshot.collect().map(_.toSeq).toSet ===
      base.collect().map(_.toSeq).toSet)
  }

  test("txn commit persists only the delta; reopen sees the new state") {
    val (cat, wh) = freshCatalog()
    cat.createTable("t", "k", base)
    cat.commit("t", Txn.empty
      .update(col("k") === 1L, Map("v" -> lit(99L)))
      .delete(col("k") === 3L))
    // "close and reopen the database": a brand-new Catalog over the same dir
    val reopened = new Catalog(spark, wh).getTable("t")
    val snap = reopened.snapshot.collect().map(_.toSeq).toSet
    assert(snap === Set(Seq(1L, 99L, "A"), Seq(2L, 20L, "B")))
    // lineage retains history: base(3) + update(1) + tombstone(1)
    assert(reopened.lineage.count() === 5)
  }

  test("saveCompacted folds tail into base and truncates it (merge)") {
    val (cat, wh) = freshCatalog()
    cat.createTable("t", "k", base)
    val after = cat.commit("t", Txn.empty
      .update(col("k") === 2L, Map("s" -> lit("Z"))))
    val wantSnap = after.snapshot.collect().map(_.toSeq).toSet
    cat.saveCompacted("t", after)
    val merged = new Catalog(spark, wh).getTable("t")
    assert(merged.snapshot.collect().map(_.toSeq).toSet === wantSnap)
    assert(merged.lineage.count() === merged.snapshot.count()) // tail gone
    assert(!Files.isDirectory(java.nio.file.Paths.get(wh, "t", "tail")))
  }

  test("drop removes the table; create rejects duplicates") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    assert(cat.tableNames == Seq("t"))
    intercept[IllegalArgumentException](cat.createTable("t", "k", base))
    cat.dropTable("t")
    assert(cat.tableNames.isEmpty)
    intercept[IllegalArgumentException](cat.getTable("t"))
  }

  test("inventory lists every table with live row counts") {
    val (cat, _) = freshCatalog()
    cat.createTable("a", "k", base)
    cat.createTable("b", "k", base.where(col("k") < 3))
    val inv = cat.inventory().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(inv === Set(("a", 3L, 3), ("b", 2L, 3)))
  }
}
