package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, count, lit, sum}

import graft.SparkSpec

/** JOIN materialized views (Catalog.createJoinMaterializedView): the
  * star-schema rollup maintained incrementally under fact changes, with
  * the documented dim-change degradation to a full recompute — never a
  * wrong delta. */
class JoinMviewSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): Catalog =
    new Catalog(spark,
      Files.createTempDirectory("graft_jmv_spec_").toString,
      autoCompact = false)

  // fact: sales rows pointing at a region dim; fk 30 dangles (no dim row)
  private def fact =
    Seq((1L, 10L, 5.00), (2L, 10L, 2.50), (3L, 20L, 4.00), (4L, 30L, 9.99))
      .toDF("k", "rid", "amount")
  private def dim =
    Seq((10L, "east"), (20L, "west"))
      .toDF("r", "region")

  private def viewState(cat: Catalog, v: String): Set[(String, Long, Long)] =
    cat.getTable(v).snapshot.select("region", "n_rows", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  /** Direct fact⋈dim rollup over the live snapshots. */
  private def recomputed(cat: Catalog): Set[(String, Long, Long)] =
    cat.getTable("f").snapshot
      .join(cat.getTable("d").snapshot, col("rid") === col("r"))
      .groupBy("region")
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.Exact.cents(col("amount"))).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def build(cat: Catalog): Unit = {
    cat.createTable("f", "k", fact)
    cat.createTable("d", "r", dim)
    cat.createJoinMaterializedView("v", "f", "d", "rid",
      Seq("region"), Seq("amount"))
  }

  test("create computes the joined rollup; unmatched fks contribute nothing") {
    val cat = fresh(); build(cat)
    assert(viewState(cat, "v") ===
      Set(("east", 2L, 750L), ("west", 1L, 400L)))
    val before = cat.getTable("v").opSeq
    cat.refreshMaterializedView("v")
    assert(cat.getTable("v").opSeq === before, "no-op refresh must not commit")
  }

  test("fact insert/update/delete refresh differentially: equals recompute") {
    val cat = fresh(); build(cat)
    // new fact row, an fk re-point (east→west: group migration through
    // the dim), a row re-pointed ONTO a dangling fk (leaves the view),
    // and a deletion emptying nothing
    cat.commit("f", Txn.empty
      .insert(Seq((9L, 20L, 1.00)).toDF("k", "rid", "amount"))
      .update(col("k") === 1L, Map("rid" -> lit(20L)))
      .update(col("k") === 2L, Map("rid" -> lit(99L)))
      .delete(col("k") === 3L))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === recomputed(cat))
    assert(viewState(cat, "v") === Set(("west", 2L, 600L)),
      "east must be DELETED from the view (both rows left it)")
  }

  test("refresh is delta-proportional: only touched groups append") {
    val cat = fresh(); build(cat)
    val rowsBefore = cat.getTable("v").lineage.count()
    cat.commit("f", Txn.empty
      .update(col("k") === 1L, Map("amount" -> lit(6.00))))
    cat.refreshMaterializedView("v")
    val appended = cat.getTable("v").lineage.count() - rowsBefore
    assert(appended === 1L, s"one touched group, got $appended new rows")
    assert(viewState(cat, "v") === recomputed(cat))
  }

  test("a DIM change maintains INCREMENTALLY: only affected groups touched (r11)") {
    val cat = fresh(); build(cat)
    val rowsBefore = cat.getTable("v").lineage.count()
    // rename a region: every east fact row re-groups — the Δdim path
    // re-aggregates ONLY fact rows referencing the changed dim key
    cat.commit("d", Txn.empty
      .update(col("r") === 10L, Map("region" -> lit("northeast"))))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") ===
      Set(("northeast", 2L, 750L), ("west", 1L, 400L)))
    assert(viewState(cat, "v") === recomputed(cat))
    // delta-cost pin: east emptied (one tombstone) + northeast inserted
    // (one row) = 2 appended rows; a full recompute would rewrite west too
    val appended = cat.getTable("v").lineage.count() - rowsBefore
    assert(appended === 2L, s"Δdim must touch 2 group rows, got $appended")
    val newVer = cat.getTable("v").currentVersion
    assert(cat.getTable("v").lineage
      .where(col(LineageTable.VER) === newVer && col("region") === "west")
      .count() === 0L, "the untouched group must not be rewritten")
    // the dim vintage re-recorded: a fact-only change refreshes
    // differentially on top (one appended group row)
    val rows2 = cat.getTable("v").lineage.count()
    cat.commit("f", Txn.empty
      .update(col("k") === 3L, Map("amount" -> lit(4.50))))
    cat.refreshMaterializedView("v")
    assert(cat.getTable("v").lineage.count() - rows2 === 1L,
      "post-Δdim refresh must be differential again")
    assert(viewState(cat, "v") === recomputed(cat))
  }

  test("Δdim covers membership too: dim insert adopts dangling fks, dim " +
      "delete empties its group; fact+dim together fall back full (r11)") {
    val cat = fresh(); build(cat)
    // dim INSERT: fk 30 was dangling — its rows join in now
    val before = cat.getTable("v").lineage.count()
    cat.commit("d", Txn.empty.insert(Seq((30L, "south")).toDF("r", "region")))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === recomputed(cat))
    assert(viewState(cat, "v").exists(_._1 == "south"))
    assert(cat.getTable("v").lineage.count() - before === 1L,
      "dim insert must append only the adopted group")
    // dim DELETE: west's only dim row goes — the group empties (DELETE arm)
    cat.commit("d", Txn.empty.delete(col("r") === 20L))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === recomputed(cat))
    assert(!viewState(cat, "v").exists(_._1 == "west"))
    // a dim change that touches no group attribute nets zero adjustments
    cat.commit("d", Txn.empty.insert(Seq((40L, "nofacts")).toDF("r", "region")))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === recomputed(cat))
    // BOTH sides moved since the last refresh: conservative full
    // recompute, still bit-equal
    cat.commit("f", Txn.empty
      .update(col("k") === 1L, Map("amount" -> lit(7.00))))
    cat.commit("d", Txn.empty
      .update(col("r") === 10L, Map("region" -> lit("e2"))))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === recomputed(cat))
  }

  test("group columns may come from both sides (composite across the join)") {
    val cat = fresh()
    cat.createTable("f", "k", fact.withColumn("ch",
      (col("k") % 2).cast("string")))
    cat.createTable("d", "r", dim)
    cat.createJoinMaterializedView("v2", "f", "d", "rid",
      Seq("region", "ch"), Seq("amount"))
    val got = cat.getTable("v2").snapshot
      .select("region", "ch", "n_rows", "cents")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(("east", "1", 1L, 500L), ("east", "0", 1L, 250L),
      ("west", "1", 1L, 400L)))
    // differential across the composite join grouping
    cat.commit("f", Txn.empty
      .update(col("k") === 2L, Map("amount" -> lit(3.00))))
    cat.refreshMaterializedView("v2")
    val after = cat.getTable("v2").snapshot
      .select("region", "ch", "n_rows", "cents")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(after === Set(("east", "1", 1L, 500L), ("east", "0", 1L, 300L),
      ("west", "1", 1L, 400L)))
  }

  test("the view survives a catalog reopen (join definition in metadata)") {
    val wh = Files.createTempDirectory("graft_jmv_reopen_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    build(cat)
    cat.commit("f", Txn.empty
      .update(col("k") === 1L, Map("amount" -> lit(7.00))))
    val cat2 = new Catalog(spark, wh, autoCompact = false)
    cat2.refreshMaterializedView("v")
    assert(viewState(cat2, "v") === recomputed(cat2))
  }

  test("bad join-view definitions are rejected loud") {
    val cat = fresh()
    cat.createTable("f", "k", fact)
    cat.createTable("d", "r", dim)
    // measure from the dim side
    intercept[IllegalArgumentException] {
      cat.createJoinMaterializedView("x1", "f", "d", "rid",
        Seq("region"), Seq("region"))
    }
    // group column on neither side
    intercept[IllegalArgumentException] {
      cat.createJoinMaterializedView("x2", "f", "d", "rid",
        Seq("nope"), Seq("amount"))
    }
    // grouping by the dim key (use the fact's fk instead)
    intercept[IllegalArgumentException] {
      cat.createJoinMaterializedView("x3", "f", "d", "rid",
        Seq("r"), Seq("amount"))
    }
    // fk must be a fact column
    intercept[IllegalArgumentException] {
      cat.createJoinMaterializedView("x4", "f", "d", "region",
        Seq("region"), Seq("amount"))
    }
  }

  test("fk and dim-side group columns are load-bearing (ADVICE r9)") {
    val cat = fresh(); build(cat)
    // dropping the fact's fk would fail every later refresh far from
    // the cause — rejected up front, like measures/groups
    val e1 = intercept[IllegalArgumentException](cat.dropColumn("f", "rid"))
    assert(e1.getMessage.contains("v"), e1.getMessage)
    // the dim-side group column the view reads through the join
    val e2 = intercept[IllegalArgumentException](cat.dropColumn("d", "region"))
    assert(e2.getMessage.contains("v"), e2.getMessage)
    // a non-load-bearing dim column still evolves freely
    cat.addColumn("d", "note", "string")
    cat.dropColumn("d", "note")
  }
}
