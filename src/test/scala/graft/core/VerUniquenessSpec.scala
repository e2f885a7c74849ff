package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, count, lit}

import graft.SparkSpec

/**
 * Pins the `(key, _ver)`-uniqueness invariant the r14 latest-read
 * optimization stands on: the snapshot's `_ver = max(_ver) OVER key` pick
 * returns ALL rows tied at the max, so it is exact ONLY while one commit
 * stamps a key at most once per `_ver`. Every write path must preserve
 * that — a future op composition that stamped a key twice under one
 * version would silently duplicate snapshot rows forever.
 *
 * Also pins the r15 guard-skip: a provably-empty partitioned table's
 * FIRST append legitimately skips the partition-immutability guard
 * (vacuous over no keys), but the very next op in the same transaction
 * must guard against the keys the first op added.
 */
class VerUniquenessSpec extends SparkSpec {
  import spark.implicits._

  private def verCounts(t: LineageTable): Seq[(Long, Long, Long)] =
    t.lineage.groupBy(col("k"), col("_ver"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("update+delete+increment on one key through Txn stamp distinct _vers") {
    val wh = Files.createTempDirectory("graft_veru_").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("t", "k", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    cat.commit("t", Txn.empty
      .update(col("k") === 1L, Map("v" -> (col("v") + lit(5L))))
      .delete(col("k") === 1L)
      .add(_.increment(col("k") === 2L, "v"))
      .insert(Seq((1L, 99L)).toDF("k", "v")))
    val t = cat.getTable("t")
    // every (key, _ver) pair appears exactly once — the max-window pick's
    // precondition
    assert(verCounts(t).forall(_._3 == 1L),
      s"duplicate (key,_ver) rows: ${verCounts(t).filter(_._3 > 1)}")
    // snapshot row counts stay exact: k=1 resurrected by the trailing
    // insert, k=2 incremented — 2 live rows, one row per key
    val snap = t.snapshot.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snap == Set((1L, 99L), (2L, 21L)))
  }

  test("commitMulti composition keeps (key,_ver) unique per table") {
    val wh = Files.createTempDirectory("graft_veru_").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("a", "k", Seq((1L, 10L)).toDF("k", "v"))
    cat.createTable("b", "k", Seq((1L, "x")).toDF("k", "s"))
    cat.commitMulti(Map(
      "a" -> Txn.empty
        .update(col("k") === 1L, Map("v" -> lit(11L)))
        .add(_.increment(col("k") === 1L, "v")),
      "b" -> Txn.empty
        .delete(col("k") === 1L)
        .insert(Seq((1L, "y")).toDF("k", "s"))))
    for (n <- Seq("a", "b")) {
      val t = cat.getTable(n)
      assert(verCounts(t).forall(_._3 == 1L),
        s"$n: duplicate (key,_ver) rows")
    }
    assert(cat.getTable("a").snapshot.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 12L)))
    assert(cat.getTable("b").snapshot.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "y")))
  }

  test("guard-skip on empty table still guards the second op of one txn") {
    val wh = Files.createTempDirectory("graft_veru_").toString
    val cat = new Catalog(spark, wh)
    // declared-schema empty CREATE, partitioned — the knownEmpty shape
    cat.createTable("p", "k",
      Seq.empty[(Long, String, Long)].toDF("k", "part", "v"),
      partitionBy = Seq("part"))
    // first op appends unguarded (no existing keys); the second op's
    // guard must see the first op's keys and reject the partition move
    val moved = intercept[Exception] {
      cat.commit("p", Txn.empty
        .insert(Seq((1L, "A", 10L)).toDF("k", "part", "v"))
        .insert(Seq((1L, "B", 11L)).toDF("k", "part", "v")))
    }
    def chain(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(t =>
        Option(t.getMessage).toSeq ++ chain(t.getCause))
    assert(chain(moved).exists(_.contains("immutable")),
      s"expected the partition-immutability guard, got: $moved")
    // and the legitimate first bulk load commits fine
    cat.commit("p", Txn.empty
      .insert(Seq((1L, "A", 10L), (2L, "B", 20L)).toDF("k", "part", "v")))
    assert(cat.getTable("p").snapshot.count() == 2L)
  }
}
