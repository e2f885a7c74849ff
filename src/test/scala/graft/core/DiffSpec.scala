package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for [[LineageTable.diffRelative]] — the CDC change feed
  * between a past version and the present. */
class DiffSpec extends SparkSpec {

  private def fixture: LineageTable = {
    import spark.implicits._
    val base = Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C"))
      .toDF("k", "v", "s")
    LineageTable.fromBase("k", base)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("diff classifies update, delete, and insert; unchanged keys absent") {
    import spark.implicits._
    val t = fixture
      .update(col("k") === 1L, Map("v" -> lit(100L)))   // op 1
      .delete(col("k") === 2L)                          // op 2
      .insert(Seq((2L, 90L, "N")).toDF("k", "v", "s"))  // op 3: resurrect
    // one step back PER RECORD (version addressing is per-record relative
    // — the select_version model, same clamp as restore): k=2's previous
    // version is its tombstone, so the diff reports its (re)insert; k=1's
    // previous version is base (old side shows the pre-update value);
    // k=3, untouched, never surfaces. A fresh single-version key clamps
    // to itself (old ≡ new) — 'insert' means "was deleted AT the target".
    assert(rows(t.diffRelative(-1)) === Set(
      Seq(1L, "update", 10L, "A", 100L, "A"),
      Seq(2L, "insert", null, null, 90L, "N")))
    // three ops back = base: k=1's update and k=2's net tomb→insert both
    // surface — the insert wins as the live side, the BASE value is the
    // old side (never the tombstone), and k=2 classifies as update
    assert(rows(t.diffRelative(-3)) === Set(
      Seq(1L, "update", 10L, "A", 100L, "A"),
      Seq(2L, "update", 20L, "B", 90L, "N")))
  }

  /** The formulation diffRelative replaces: full-outer-join the two
    * version reads — semantically authoritative, twice the scans. */
  private def joinDiff(t: LineageTable, rel: Int) = {
    val old = t.asOfRelative(rel).select(col("k"),
      col("v").as("old_v"), col("s").as("old_s"))
    val now = t.snapshot.select(col("k"),
      col("v").as("new_v"), col("s").as("new_s"))
    old.join(now, Seq("k"), "full_outer")
      .where(!(struct(col("old_v"), col("old_s")) <=>
               struct(col("new_v"), col("new_s"))))
      .withColumn("change",
        when(col("old_v").isNull && col("old_s").isNull, "insert")
          .when(col("new_v").isNull && col("new_s").isNull, "delete")
          .otherwise("update"))
      .select("k", "change", "old_v", "old_s", "new_v", "new_s")
  }

  test("diff equals the join of the two version reads it replaces") {
    val t = fixture
      .update(col("k") % 2 === 1L, Map("v" -> (col("v") + 1L)))
      .update(col("k") === 3L, Map("s" -> lit("Z")))
      .delete(col("k") === 1L)
    for (rel <- Seq(-1, -2, -3))
      assert(rows(t.diffRelative(rel)) === rows(joinDiff(t, rel)),
        s"relative $rel")
  }

  test("diff equals the join reference for random op histories") {
    // seeded random interleavings (the LineageModelSpec idiom) cover the
    // clamp/tombstone/resurrection combinations no fixed fixture varies;
    // the op list prints on mismatch for reproduction
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rng = new scala.util.Random(seed)
      val ops = List.fill(5)(rng.nextInt(3))
      val t = ops.foldLeft(fixture) { (acc, kind) =>
        kind match {
          case 0 => acc.update(col("k") % 2 === rng.nextInt(2).toLong,
            Map("v" -> (col("v") + lit(1L + rng.nextInt(9)))))
          case 1 => acc.delete(col("k") === rng.nextInt(4).toLong)
          case 2 => acc.insert(Seq((rng.nextInt(5).toLong,
            rng.nextInt(100).toLong, "R")).toDF("k", "v", "s"))
        }
      }
      for (rel <- Seq(-1, -2, -4))
        assert(rows(t.diffRelative(rel)) === rows(joinDiff(t, rel)),
          s"seed $seed rel $rel ops $ops")
    }
  }

  test("diff beyond history clamps at base (deep rel = diff vs base)") {
    val t = fixture.update(col("k") === 1L, Map("v" -> lit(100L)))
    assert(rows(t.diffRelative(-99)) === rows(t.diffRelative(-1)))
  }

  test("diff on an unwritten table is empty") {
    assert(fixture.diffRelative(-1).count() === 0L)
  }

  test("a key dead at BOTH versions never surfaces") {
    import spark.implicits._
    val t = fixture
      .delete(col("k") === 2L)                           // op 1
      .insert(Seq((2L, 90L, "N")).toDF("k", "v", "s"))   // op 2
      .delete(col("k") === 2L)                           // op 3
    // two steps back for k=2 is its FIRST tombstone; now its second —
    // dead on both sides, nothing to report
    assert(t.diffRelative(-2).where(col("k") === 2L).count() === 0L)
    // but against base (three back) it is a plain delete of the base row
    assert(rows(t.diffRelative(-3).where(col("k") === 2L)) ===
      Set(Seq(2L, "delete", 20L, "B", null, null)))
  }
}
