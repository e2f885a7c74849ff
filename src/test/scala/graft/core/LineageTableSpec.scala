package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests against reference lstore/query.py semantics. */
class LineageTableSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def fixture: LineageTable = {
    import spark.implicits._
    val base = Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C"))
      .toDF("k", "v", "s")
    LineageTable.fromBase("k", base)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("snapshot of a fresh base is the base") {
    assert(rows(fixture.snapshot) ===
      Set(Seq(1L, 10L, "A"), Seq(2L, 20L, "B"), Seq(3L, 30L, "C")))
  }

  test("partial update carries untouched columns forward (schema encoding)") {
    val t = fixture
      .update(col("k") === 1L, Map("v" -> lit(100L)))      // v1: v only
      .update(col("k") === 1L, Map("s" -> lit("Z")))       // v2: s only
    assert(rows(t.snapshot.where(col("k") === 1L)) === Set(Seq(1L, 100L, "Z")))
  }

  test("select_version clamps at base like reference lstore/query.py:118") {
    val t = fixture.update(col("k") === 1L, Map("v" -> lit(100L)))
    // k=1 has 2 versions; k=2 has 1. asOf(-1): k=1 → base, k=2 → clamped base.
    assert(rows(t.asOfRelative(-1)) ===
      Set(Seq(1L, 10L, "A"), Seq(2L, 20L, "B"), Seq(3L, 30L, "C")))
    // far past clamps at base too
    assert(rows(t.asOfRelative(-99)) === rows(t.asOfRelative(-1)))
    // latest sees the update
    assert(rows(t.asOfRelative(0).where(col("k") === 1L)) === Set(Seq(1L, 100L, "A")))
  }

  test("delete tombstones a record; lineage retains history") {
    val t = fixture.delete(col("k") === 2L)
    assert(t.snapshot.count() === 2)
    assert(t.snapshot.where(col("k") === 2L).count() === 0)
    assert(t.lineage.count() === 4) // 3 base + 1 tombstone
  }

  test("insert then snapshot unions new records") {
    import spark.implicits._
    val t = fixture.insert(Seq((4L, 40L, "D")).toDF("k", "v", "s"))
    assert(t.snapshot.count() === 4)
  }

  test("insert after delete resurrects the key (reference drops deleted RIDs)") {
    import spark.implicits._
    val t = fixture
      .delete(col("k") === 2L)
      .insert(Seq((2L, 200L, "B2")).toDF("k", "v", "s"))
    // the re-insert outranks the tombstone: table-level monotonic _ver
    assert(rows(t.snapshot.where(col("k") === 2L)) === Set(Seq(2L, 200L, "B2")))
    assert(t.snapshot.count() === 3)
  }

  test("re-inserting a live key is a deterministic upsert (latest op wins)") {
    import spark.implicits._
    val t = fixture
      .insert(Seq((1L, 111L, "X")).toDF("k", "v", "s"))
      .insert(Seq((1L, 222L, "Y")).toDF("k", "v", "s"))
    assert(rows(t.snapshot.where(col("k") === 1L)) === Set(Seq(1L, 222L, "Y")))
  }

  test("increment is a declarative +1 update version") {
    val t = fixture.increment(col("k") === 3L, "v")
    assert(rows(t.snapshot.where(col("k") === 3L)) === Set(Seq(3L, 31L, "C")))
  }

  test("compact preserves the snapshot and resets lineage depth") {
    val t = fixture
      .update(col("k") === 1L, Map("v" -> lit(100L)))
      .delete(col("k") === 2L)
    val c = t.compact
    assert(rows(c.snapshot) === rows(t.snapshot))
    assert(c.lineage.count() === c.snapshot.count()) // tail truncated
  }

  test("purge erases every version of matching keys; neighbors keep history") {
    val t = fixture
      .update(col("k") === 1L, Map("v" -> lit(100L))) // k=1 has history
      .update(col("k") === 2L, Map("v" -> lit(200L)))
    // v=100 appeared in an OLD version of k=1 but was then overwritten —
    // purge must still erase the key (any version matches)
    val p = t.update(col("k") === 1L, Map("v" -> lit(111L)))
      .purge(col("v") === 100L)
    assert(p.snapshot.where(col("k") === 1L).isEmpty)
    assert(p.lineage.where(col("k") === 1L).isEmpty, "history not erased")
    assert(p.asOfRelative(-5).where(col("k") === 1L).isEmpty)
    // neighbor k=2 keeps ALL versions (prev read still sees v=20)
    assert(rows(p.snapshot.where(col("k") === 2L)) === Set(Seq(2L, 200L, "B")))
    assert(rows(p.asOfRelative(-5).where(col("k") === 2L)) === Set(Seq(2L, 20L, "B")))
    // the pending delta is scrubbed too: erasure survives a commit
    assert(p.delta.forall(_.where(col("k") === 1L).isEmpty))
  }

  test("txn batch is all-or-nothing; run on failure leaves table unchanged") {
    import spark.implicits._
    val t = fixture
    val good = Txn.empty
      .insert(Seq((5L, 50L, "E")).toDF("k", "v", "s"))
      .update(col("k") === 1L, Map("v" -> (col("v") + 1L)))
      .delete(col("k") === 3L)
    val committed = good.commit(t)
    assert(committed.snapshot.count() === 3) // +1 insert, -1 delete
    assert(t.snapshot.count() === 3)         // original untouched
    val bad = Txn.empty.add(_ => throw new RuntimeException("abort"))
    assert(bad.run(t).isLeft)
  }
}
