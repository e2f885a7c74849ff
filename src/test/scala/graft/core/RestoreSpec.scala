package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for [[LineageTable.restore]] — time-travel rollback as an
  * append-only write op. */
class RestoreSpec extends SparkSpec {

  private def fixture: LineageTable = {
    import spark.implicits._
    val base = Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C"))
      .toDF("k", "v", "s")
    LineageTable.fromBase("k", base)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("restore(-k).snapshot equals asOfRelative(-k) — the postcondition") {
    val t = fixture
      .update(col("k") === 1L, Map("v" -> lit(100L)))
      .delete(col("k") === 2L)
      .update(col("k") === 3L, Map("s" -> lit("Z")))
    for (k <- Seq(-1, -2, -3, -9)) {
      val expected = rows(t.asOfRelative(k))
      assert(rows(t.restore(k).snapshot) === expected, s"relative $k")
    }
    // -1 specifically: k=2's tombstone unwinds (resurrection), k=3's
    // update unwinds, k=1 steps back to its base value
    assert(rows(t.restore(-1).snapshot) ===
      Set(Seq(1L, 10L, "A"), Seq(2L, 20L, "B"), Seq(3L, 30L, "C")))
  }

  test("restore deletes records born after the target's clamp never existed") {
    // insert then restore(-1): the inserted key's lineage has ONE version,
    // which clamps to itself — the insert survives (per-record relative
    // versioning, the reference's select_version model, not point-in-time)
    import spark.implicits._
    val t = fixture.insert(Seq((9L, 90L, "N")).toDF("k", "v", "s"))
    assert(rows(t.restore(-1).snapshot).contains(Seq(9L, 90L, "N")))
  }

  test("restore is append-only and proportional to changed records") {
    val t = fixture
      .update(col("k") === 1L, Map("v" -> lit(100L)))
      .update(col("k") === 1L, Map("v" -> lit(200L)))
    val before = t.lineage.count()
    val restored = t.restore(-1)
    // exactly ONE record changed in the last op — one appended row
    assert(restored.lineage.count() === before + 1)
    // history preserved: the pre-restore latest is still addressable
    assert(rows(restored.asOfRelative(-1).where(col("k") === 1L)) ===
      Set(Seq(1L, 200L, "A")))
  }

  test("restore of a restore returns to the pre-restore state") {
    val t = fixture.update(col("k") === 1L, Map("v" -> lit(100L)))
    val undone = t.restore(-1)            // k=1 back to v=10
    assert(rows(undone.snapshot.where(col("k") === 1L)) === Set(Seq(1L, 10L, "A")))
    val redone = undone.restore(-1)       // undo the undo
    assert(rows(redone.snapshot.where(col("k") === 1L)) === Set(Seq(1L, 100L, "A")))
  }

  test("restore on a compacted (single-version) table is a no-op") {
    val t = fixture
    assert(t.restore(-3) eq t)
    val c = fixture.update(col("k") === 1L, Map("v" -> lit(1L))).compact
    assert(c.restore(-1) eq c)
  }

  test("restore rejects non-negative targets") {
    intercept[IllegalArgumentException](fixture.restore(0))
    intercept[IllegalArgumentException](fixture.restore(1))
  }

  test("restored table chains further ops (it is a normal write)") {
    val t = fixture
      .delete(col("k") === 2L)
      .restore(-1)                               // resurrect k=2
      .update(col("k") === 2L, Map("s" -> lit("R")))
    assert(rows(t.snapshot.where(col("k") === 2L)) === Set(Seq(2L, 20L, "R")))
  }
}
