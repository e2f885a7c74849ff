package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CHECK constraints enforced at commit (Catalog.addConstraint): Delta's
  * ADD CONSTRAINT semantics — full scan once at add time, O(delta) per
  * commit, ANSI three-valued logic, atomic rejection. */
class ConstraintSpec extends SparkSpec {

  private def freshCatalog(): (Catalog, String) = {
    val wh = Files.createTempDirectory("graft_ck_").toString
    (new Catalog(spark, wh), wh)
  }

  private def base = {
    import spark.implicits._
    Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C")).toDF("k", "v", "s")
  }

  test("addConstraint rejects when EXISTING rows violate") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    val r = scala.util.Try(cat.addConstraint("t", "v_big", "v > 15"))
    assert(r.isFailure && r.failed.get.getMessage.contains("v_big"))
    assert(cat.constraints("t").isEmpty, "failed add must persist nothing")
  }

  test("violating commit is rejected ATOMICALLY; clean commits proceed") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    cat.addConstraint("t", "v_pos", "v > 0")
    val lineageBefore = cat.getTable("t").lineage.count()
    val r = scala.util.Try(cat.commit("t",
      Txn.empty.update(col("k") === 2L, Map("v" -> lit(-1L)))))
    assert(r.isFailure && r.failed.get.getMessage.contains("v_pos"))
    // nothing landed: same lineage rows, same snapshot
    assert(cat.getTable("t").lineage.count() === lineageBefore)
    assert(cat.getTable("t").snapshot.collect().map(_.toSeq).toSet ===
      base.collect().map(_.toSeq).toSet)
    // the table is not wedged: a clean commit applies
    cat.commit("t", Txn.empty.update(col("k") === 2L, Map("v" -> lit(21L))))
    assert(cat.getTable("t").snapshot.where(col("k") === 2L)
      .head().getLong(1) === 21L)
  }

  test("NULL predicate PASSES (ANSI three-valued CHECK)") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    cat.addConstraint("t", "v_pos", "v > 0")
    import spark.implicits._
    // v = NULL → predicate NULL → not a violation
    val rows = Seq((9L, Option.empty[Long], "N")).toDF("k", "v", "s")
    cat.commit("t", Txn.empty.insert(rows))
    assert(cat.getTable("t").snapshot.where(col("k") === 9L).count() === 1)
  }

  test("deletes always pass; a RESTORE resurrecting a violating state is caught") {
    val (cat, _) = freshCatalog()
    import spark.implicits._
    // history: v = -5 (pre-constraint) → updated to 5 → constraint added
    // (validates the LIVE snapshot only — old versions may violate)
    cat.createTable("t", "k", Seq((1L, -5L, "A")).toDF("k", "v", "s"))
    cat.commit("t", Txn.empty.update(col("k") === 1L, Map("v" -> lit(5L))))
    cat.addConstraint("t", "v_pos", "v > 0")
    // a delete's tombstone is exempt (its values are not live state)
    cat.commit("t", Txn.empty.delete(col("k") === 1L))
    assert(cat.getTable("t").snapshot.count() === 0)
    // restoring the pre-constraint version would make v = -5 LIVE again —
    // the O(delta) gate sees the restored row as a written version and
    // rejects it (the live-state invariant holds against history too)
    val r = scala.util.Try(cat.commit("t",
      Txn.empty.add(_.restore(-2))))
    assert(r.isFailure && r.failed.get.getMessage.contains("v_pos"),
      s"restore of a violating historical state must be rejected: $r")
  }

  test("dropConstraint lifts enforcement") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    cat.addConstraint("t", "v_pos", "v > 0")
    cat.dropConstraint("t", "v_pos")
    cat.commit("t", Txn.empty.update(col("k") === 1L, Map("v" -> lit(-9L))))
    assert(cat.getTable("t").snapshot.where(col("v") < 0).count() === 1)
  }

  test("violation message names the violated constraint, not the others") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    cat.addConstraint("t", "v_pos", "v > 0")
    cat.addConstraint("t", "s_short", "length(s) <= 4")
    val r = scala.util.Try(cat.commit("t",
      Txn.empty.update(col("k") === 1L, Map("s" -> lit("TOOLONG")))))
    assert(r.isFailure)
    val msg = r.failed.get.getMessage
    assert(msg.contains("s_short") && !msg.contains("v_pos ("), msg)
  }

  test("commitMulti validates at stage time — whole transaction aborts") {
    val (cat, _) = freshCatalog()
    cat.createTable("a", "k", base)
    cat.createTable("b", "k", base)
    cat.addConstraint("b", "v_pos", "v > 0")
    val r = scala.util.Try(cat.commitMulti(Map(
      "a" -> Txn.empty.update(col("k") === 1L, Map("v" -> lit(11L))),
      "b" -> Txn.empty.update(col("k") === 1L, Map("v" -> lit(-1L))))))
    assert(r.isFailure && r.failed.get.getMessage.contains("v_pos"))
    // both-or-neither: table a must NOT carry the update
    assert(cat.getTable("a").snapshot.where(col("k") === 1L)
      .head().getLong(1) === 10L)
  }

  test("constraints survive a catalog reopen (hex round-trip of real SQL)") {
    val (cat, wh) = freshCatalog()
    cat.createTable("t", "k", base)
    val expr = "s IN ('A', 'B', 'C', 'OK') AND v >= 0"
    cat.addConstraint("t", "composite", expr)
    val reopened = new Catalog(spark, wh)
    assert(reopened.constraints("t") === Map("composite" -> expr))
    val r = scala.util.Try(reopened.commit("t",
      Txn.empty.update(col("k") === 3L, Map("s" -> lit("ZZ")))))
    assert(r.isFailure && r.failed.get.getMessage.contains("composite"))
  }

  test("unresolvable expression is rejected BEFORE the meta write") {
    val (cat, _) = freshCatalog()
    cat.createTable("t", "k", base)
    val r = scala.util.Try(cat.addConstraint("t", "bad", "no_such_col > 0"))
    assert(r.isFailure)
    assert(cat.constraints("t").isEmpty)
    // the table still commits normally
    cat.commit("t", Txn.empty.update(col("k") === 1L, Map("v" -> lit(11L))))
  }
}
