package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE INTO semantics (LineageTable.mergeInto): one atomic op covering
  * the matched-update / matched-delete / not-matched-insert arms. */
class MergeIntoSpec extends SparkSpec {

  import spark.implicits._

  private def table = LineageTable.fromBase("k",
    Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C"), (4L, 40L, "D"))
      .toDF("k", "v", "s"))

  test("matched rows update listed columns, others carry forward") {
    val src = Seq((2L, 999L, "X"), (3L, 888L, "Y")).toDF("k", "v", "s")
    val out = table.mergeInto(src, Seq("v")).snapshot
      .collect().map(_.toSeq).toSet
    // v comes from source, s carries forward from the target
    assert(out === Set(Seq(1L, 10L, "A"), Seq(2L, 999L, "B"),
      Seq(3L, 888L, "C"), Seq(4L, 40L, "D")))
  }

  test("unmatched source rows insert; matched deleteWhen rows tombstone") {
    val src = Seq((3L, 0L, "del"), (9L, 90L, "I")).toDF("k", "v", "s")
    val out = table
      .mergeInto(src, Seq("v", "s"), deleteWhen = Some(col("s") === "del"))
      .snapshot.collect().map(_.toSeq).toSet
    assert(out === Set(Seq(1L, 10L, "A"), Seq(2L, 20L, "B"),
      Seq(4L, 40L, "D"), Seq(9L, 90L, "I")))
  }

  test("deleteWhen applies only to MATCHED rows — unmatched still insert") {
    val src = Seq((9L, 90L, "del")).toDF("k", "v", "s")
    val out = table
      .mergeInto(src, Seq("v"), deleteWhen = Some(col("s") === "del"))
      .snapshot.collect().map(_.toSeq).toSet
    // the WHEN MATCHED AND cond THEN DELETE clause never guards inserts
    assert(out.contains(Seq(9L, 90L, "del")))
  }

  test("merge matches against the live snapshot: tombstoned keys resurrect") {
    val dead = table.delete(col("k") === 2L)
    val src = Seq((2L, 222L, "R")).toDF("k", "v", "s")
    val out = dead.mergeInto(src, Seq("v")).snapshot
      .collect().map(_.toSeq).toSet
    // key 2 was dead → NOT matched → inserts with the full source row
    assert(out.contains(Seq(2L, 222L, "R")))
  }

  test("the whole merge is ONE version: history shows a single new stamp") {
    val src = Seq((1L, 11L, "A"), (9L, 90L, "I")).toDF("k", "v", "s")
    val merged = table.mergeInto(src, Seq("v"))
    val vers = merged.lineage.select("_ver").distinct()
      .as[Long].collect().sorted
    assert(vers === Array(0L, 1L), "update + insert share one _ver stamp")
  }

  test("the appended delta is exactly one row per source row") {
    val src = Seq((1L, 11L, "A"), (3L, 33L, "C"), (9L, 90L, "I"))
      .toDF("k", "v", "s")
    val merged = table.mergeInto(src, Seq("v"))
    assert(merged.delta.get.count() === 3L,
      "merge cost must be proportional to |source|, not the table")
  }

  test("null keys merge null-safely: a null-keyed record UPDATES, not dups") {
    val withNull = LineageTable.fromBase("k",
      Seq((Some(1L), 10L, "A"), (None, 20L, "N")).toDF("k", "v", "s"))
    val src = Seq((Option.empty[Long], 99L, "N2")).toDF("k", "v", "s")
    // updateCols = v ONLY: the null-keyed match must take the UPDATE arm
    // (s carries forward from the target) — matched-ness via the key's
    // null-ness would misroute it to the insert arm and overwrite s
    val out = withNull.mergeInto(src, Seq("v")).snapshot
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getString(2))).toSet
    assert(out === Set((Some(1L), 10L, "A"), (None, 99L, "N")))
  }

  test("a NULL deleteWhen gate means keep, never a vanished record") {
    // three-valued logic trap: s === "del" is NULL when s is NULL; an
    // un-coalesced gate would stamp _del = NULL and the record would
    // fail the snapshot's _del = 0 filter — silent data loss
    val src = Seq((2L, 222L, null.asInstanceOf[String])).toDF("k", "v", "s")
    val out = table
      .mergeInto(src, Seq("v", "s"), deleteWhen = Some(col("s") === "del"))
      .snapshot.collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out.contains((2L, 222L, None)), s"record 2 vanished: $out")
    assert(out.size === 4)
  }

  test("duplicate source keys fail fast instead of corrupting version ties") {
    val src = Seq((2L, 100L, "X"), (2L, 200L, "Y"), (9L, 90L, "I"))
      .toDF("k", "v", "s")
    val e = intercept[Exception] {
      table.mergeInto(src, Seq("v")).snapshot.collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate source key")), e.toString)
  }

  test("merge equals the insert/update/delete compose it replaces") {
    val src = Seq((2L, 222L, "B2"), (4L, 0L, "del"), (9L, 90L, "I"))
      .toDF("k", "v", "s")
    val viaMerge = table
      .mergeInto(src, Seq("v", "s"), deleteWhen = Some(col("s") === "del"))
      .snapshot.collect().map(_.toSeq).toSet
    val viaOps = table
      .update(col("k") === 2L, Map("v" -> lit(222L), "s" -> lit("B2")))
      .delete(col("k") === 4L)
      .insert(Seq((9L, 90L, "I")).toDF("k", "v", "s"))
      .snapshot.collect().map(_.toSeq).toSet
    assert(viaMerge === viaOps)
  }

  test("NOT MATCHED BY SOURCE deletes target rows the source omitted (r12)") {
    // source carries keys 2 (update) and 9 (insert); 1/3/4 vanish
    val src = Seq((2L, 222L, "B2"), (9L, 90L, "I")).toDF("k", "v", "s")
    val out = table.mergeInto(src, Seq("v", "s"),
        notMatchedBySourceDelete = Some(lit(true)))
      .snapshot.collect().map(_.toSeq).toSet
    assert(out === Set(Seq(2L, 222L, "B2"), Seq(9L, 90L, "I")))
  }

  test("NOT MATCHED BY SOURCE condition gates on target columns; NULL=keep") {
    val src = Seq((9L, 90L, "I")).toDF("k", "v", "s")
    // delete vanished rows only when v >= 30; a NULL gate means keep
    val withNullV = LineageTable.fromBase("k",
      Seq((1L, Some(10L), "A"), (2L, Some(30L), "B"), (3L, None, "C"))
        .toDF("k", "v", "s"))
    val out = withNullV.mergeInto(src, Seq("v"),
        notMatchedBySourceDelete = Some(col("v") >= 30L))
      .snapshot.collect().map(r => r.getLong(0)).toSet
    assert(out === Set(1L, 3L, 9L), "only k=2 (v=30) tombstones; NULL keeps")
  }

  test("bySource delete shares the merge's single _ver stamp") {
    val src = Seq((2L, 222L, "B2")).toDF("k", "v", "s")
    val merged = table.mergeInto(src, Seq("v"),
      notMatchedBySourceDelete = Some(lit(true)))
    val vers = merged.lineage.select("_ver").distinct()
      .as[Long].collect().sorted
    assert(vers === Array(0L, 1L))
    // and the snapshot is exactly the source-matched row
    assert(merged.snapshot.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("NOT MATCHED BY SOURCE UPDATE re-stamps vanished rows, keeps them live (r12)") {
    // source carries 2 (update) and 9 (insert); 1/3/4 vanish → deactivate
    val src = Seq((2L, 222L, "B2"), (9L, 90L, "I")).toDF("k", "v", "s")
    val out = table.mergeInto(src, Seq("v", "s"),
        notMatchedBySourceUpdate =
          Some((None, Map("s" -> lit("STALE"), "v" -> (col("v") + 1L)))))
      .snapshot.collect().map(_.toSeq).toSet
    // assignments evaluate over the TARGET row (v increments in place)
    assert(out === Set(Seq(1L, 11L, "STALE"), Seq(2L, 222L, "B2"),
      Seq(3L, 31L, "STALE"), Seq(4L, 41L, "STALE"), Seq(9L, 90L, "I")))
  }

  test("bySource update: gate over target columns, NULL=keep; one _ver stamp") {
    val src = Seq((9L, 90L, "I")).toDF("k", "v", "s")
    val withNullV = LineageTable.fromBase("k",
      Seq((1L, Some(10L), "A"), (2L, Some(30L), "B"), (3L, None, "C"))
        .toDF("k", "v", "s"))
    val merged = withNullV.mergeInto(src, Seq("v"),
      notMatchedBySourceUpdate =
        Some((Some(col("v") >= 30L), Map("s" -> lit("STALE")))))
    val out = merged.snapshot.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "A", 2L -> "STALE", 3L -> "C", 9L -> "I"),
      "only k=2 (v=30) re-stamps; the NULL gate keeps k=3 untouched")
    assert(merged.lineage.select("_ver").distinct().as[Long].collect()
      .sorted === Array(0L, 1L))
  }

  test("bySource update guards: both actions reject; key assignment rejects") {
    val src = Seq((2L, 222L, "B2")).toDF("k", "v", "s")
    assert(intercept[IllegalArgumentException] {
      table.mergeInto(src, Seq("v"),
        notMatchedBySourceDelete = Some(lit(true)),
        notMatchedBySourceUpdate = Some((None, Map("s" -> lit("X")))))
    }.getMessage.contains("at most ONE"))
    assert(intercept[IllegalArgumentException] {
      table.mergeInto(src, Seq("v"),
        notMatchedBySourceUpdate = Some((None, Map("k" -> lit(0L)))))
    }.getMessage.contains("non-key"))
  }
}
