package graft.sql

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{Catalog, LineageTable}

/**
 * SQL DML front door (reference write surface: lstore/query.py:57
 * insert, :131 update, :27 delete, transaction.py batches — there as a
 * host-language API, here as ANSI statements over Spark's own parser).
 */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): GraftSql = {
    val base = Seq((1L, 10L, "A", 100.0), (2L, 20L, "B", 200.0),
      (3L, 30L, "C", 300.0)).toDF("k", "custkey", "status", "totalprice")
    new GraftSql(spark).register("t", LineageTable.fromBase("k", base))
  }

  private def rows(g: GraftSql) =
    g.table("t").snapshot.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSeq

  test("INSERT INTO ... VALUES appends through the engine (typed, versioned)") {
    val g = fixture()
    g.sql("INSERT INTO t VALUES (4, 40, 'D', 400.0)")
    assert(rows(g) === Seq((1L, 10L, "A", 100.0), (2L, 20L, "B", 200.0),
      (3L, 30L, "C", 300.0), (4L, 40L, "D", 400.0)))
    // int literals widened to the table's bigint/double — ANSI INSERT
    assert(g.table("t").snapshot.schema("k").dataType.typeName === "long")
    // INSERT OVERWRITE: delete-all + insert; history kept — the
    // pre-overwrite TABLE state reads back via table-level version
    // addressing (asOfRelative is per-record and clamps new keys to
    // their base, so it can't express "the table before the overwrite")
    g.sql("INSERT OVERWRITE TABLE t VALUES (9, 90, 'Z', 900.0)")
    assert(rows(g) === Seq((9L, 90L, "Z", 900.0)))
    assert(g.table("t").asOfVersion(1L).count() === 4L)
  }

  test("INSERT INTO t (cols...) reorders by name; INSERT ... SELECT reads views") {
    val g = fixture()
    g.sql("INSERT INTO t (status, k, totalprice, custkey) VALUES ('E', 5, 500.0, 50)")
    assert(rows(g).last === ((5L, 50L, "E", 500.0)))
    // the registered snapshot view is readable mid-stream and feeds DML
    g.sql("INSERT INTO t SELECT k + 100, custkey, 'X', totalprice FROM t WHERE k = 1")
    assert(rows(g).last === ((101L, 10L, "X", 100.0)))
  }

  test("UPDATE ... SET ... WHERE maps to the engine's partial update") {
    val g = fixture()
    g.sql("UPDATE t SET status = 'U', totalprice = totalprice + 5 WHERE k % 2 = 1")
    assert(rows(g) === Seq((1L, 10L, "U", 105.0), (2L, 20L, "B", 200.0),
      (3L, 30L, "U", 305.0)))
    // one _ver per statement: history shows the update as one op
    assert(g.table("t").lineage.where($"k" === 1L).count() === 2)
  }

  test("DELETE FROM ... WHERE tombstones (versioned, not erased)") {
    val g = fixture()
    g.sql("DELETE FROM t WHERE custkey >= 30")
    assert(rows(g).map(_._1) === Seq(1L, 2L))
    assert(g.table("t").lineage.where($"k" === 3L).count() === 2,
      "delete must append a tombstone, never rewrite history")
  }

  test("MERGE INTO maps to the engine's single-op upsert (all three arms)") {
    val g = fixture()
    g.sql("""MERGE INTO t USING (
            |  SELECT 2 AS k, 20 AS custkey, 'M' AS status, 999.0 AS totalprice
            |  UNION ALL
            |  SELECT 3, 30, 'del', 0.0
            |  UNION ALL
            |  SELECT 9, 90, 'N', 900.0) s
            |ON t.k = s.k
            |WHEN MATCHED AND s.status = 'del' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET status = s.status, totalprice = s.totalprice
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(g) === Seq((1L, 10L, "A", 100.0), (2L, 20L, "M", 999.0),
      (9L, 90L, "N", 900.0)))
    // the whole merge is ONE version stamp
    val vers = g.table("t").lineage.select("_ver").distinct().count()
    assert(vers === 2, "merge must take exactly one _ver")
  }

  test("MERGE ordered WHEN MATCHED arms: first-match-wins, no-arm rows " +
      "stay unchanged (r13)") {
    val g = fixture()
    // k=1 (custkey 10): arm1 even → UPDATE, shadowing the %5 DELETE arm.
    // k=2 (custkey 20): arm1 even → UPDATE.
    // k=3 (custkey 30): even → UPDATE (30 is also %5 and %3 — order wins).
    // Re-key the fixture for odd custkeys: add rows 4 (35: odd, %5 →
    // DELETE via arm2), 5 (21: odd, non-%5, %3 → UPDATE via arm3),
    // 6 (11: odd, no arm → UNCHANGED, source price ignored).
    g.sql("INSERT INTO t VALUES (4, 35, 'D', 400.0), (5, 21, 'E', 500.0)," +
      " (6, 11, 'F', 600.0)")
    g.sql("""MERGE INTO t USING (
            |  SELECT 1 AS k, 10 AS custkey, 'X' AS status, 1.0 AS totalprice
            |  UNION ALL SELECT 4, 35, 'X', 4.0
            |  UNION ALL SELECT 5, 21, 'X', 5.0
            |  UNION ALL SELECT 6, 11, 'X', 6.0
            |  UNION ALL SELECT 9, 90, 'I', 900.0) s
            |ON t.k = s.k
            |WHEN MATCHED AND s.custkey % 2 = 0
            |  THEN UPDATE SET status = s.status, totalprice = s.totalprice
            |WHEN MATCHED AND s.custkey % 5 = 0 THEN DELETE
            |WHEN MATCHED AND s.custkey % 3 = 0
            |  THEN UPDATE SET status = s.status, totalprice = s.totalprice
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(g) === Seq((1L, 10L, "X", 1.0), (2L, 20L, "B", 200.0),
      (3L, 30L, "C", 300.0), (5L, 21L, "X", 5.0), (6L, 11L, "F", 600.0),
      (9L, 90L, "I", 900.0)))
    // the unchanged row (k=6) appended NO new version — its lineage is
    // exactly the insert that created it
    assert(g.table("t").lineage.where($"k" === 6L).count() === 1,
      "a matched row passing no arm must not re-stamp")
    // an unconditional arm anywhere but last rejects loud — Spark's own
    // parser enforces it (NON_LAST_MATCHED_CLAUSE_OMIT_CONDITION); the
    // binder keeps its own guard as defense for hand-built plans
    val e1 = intercept[Exception] {
      g.sql("""MERGE INTO t USING (SELECT 1 AS k, 10 AS custkey,
              |'x' AS status, 1.0 AS totalprice) s ON t.k = s.k
              |WHEN MATCHED THEN DELETE
              |WHEN MATCHED AND s.custkey % 2 = 0
              |  THEN UPDATE SET status = s.status, totalprice = s.totalprice
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e1.getMessage.contains("LAST WHEN MATCHED arm") ||
      e1.getMessage.toLowerCase.contains("omit the condition"),
      e1.getMessage)
    // arms may SET DIFFERENT columns (r13 per-column gates): the row
    // taking an arm copies exactly that arm's columns, carries the rest
    g.sql("""MERGE INTO t USING (
            |  SELECT 2 AS k, 20 AS custkey, 'P' AS status, 7.0 AS totalprice
            |  UNION ALL SELECT 9, 91, 'Q', 8.0) s ON t.k = s.k
            |WHEN MATCHED AND s.custkey % 2 = 0
            |  THEN UPDATE SET status = s.status
            |WHEN MATCHED THEN UPDATE SET totalprice = s.totalprice
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // k=2 (even): status arm fired, totalprice CARRIED; k=9 (odd):
    // totalprice arm fired, status (and untouched custkey) carried
    assert(rows(g).filter(r => r._1 == 2L || r._1 == 9L) ===
      Seq((2L, 20L, "P", 200.0), (9L, 90L, "I", 8.0)))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE tombstones vanished rows (r12)") {
    val g = fixture()
    // the sync-job form: source is the full upstream state; rows absent
    // from it (k=1, k=3) deactivate — but the condition keeps k=1
    g.sql("""MERGE INTO t USING (
            |  SELECT 2 AS k, 20 AS custkey, 'M' AS status, 999.0 AS totalprice
            |  UNION ALL
            |  SELECT 9, 90, 'N', 900.0) s
            |ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *
            |WHEN NOT MATCHED BY SOURCE AND custkey >= 30 THEN DELETE""".stripMargin)
    assert(rows(g) === Seq((1L, 10L, "A", 100.0), (2L, 20L, "M", 999.0),
      (9L, 90L, "N", 900.0)))
    // still ONE version stamp for the whole merge
    assert(g.table("t").lineage.select("_ver").distinct().count() === 2)
    // a source-qualified column in the BY SOURCE condition is a loud
    // error: no source row exists for an unmatched-by-source record
    val e = intercept[IllegalArgumentException] {
      g.sql("""MERGE INTO t USING (SELECT 1 AS k, 1 AS custkey,
              |'x' AS status, 1.0 AS totalprice) s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *
              |WHEN NOT MATCHED BY SOURCE AND s.status = 'x' THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("TARGET columns"))
    // UPDATE BY SOURCE (r12 session B): vanished rows RE-STAMP with
    // target-row assignments instead of tombstoning — k=2 and k=9 are in
    // the source (k=2 matched-updates), everything else reads 'gone'
    g.sql("""MERGE INTO t USING (SELECT 2 AS k, 20 AS custkey,
            |'M2' AS status, 998.0 AS totalprice) s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *
            |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'gone'""".stripMargin)
    assert(rows(g) === Seq((1L, 10L, "gone", 100.0), (2L, 20L, "M2", 998.0),
      (9L, 90L, "gone", 900.0)))
    // a source-qualified ASSIGNMENT value is the same loud error as a
    // source-qualified gate
    val e2 = intercept[IllegalArgumentException] {
      g.sql("""MERGE INTO t USING (SELECT 1 AS k, 1 AS custkey,
              |'x' AS status, 1.0 AS totalprice) s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *
              |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = s.status""".stripMargin)
    }
    assert(e2.getMessage.contains("TARGET columns"))
    // ... and so is a source-qualified assignment TARGET: SET s.col=...
    // must not silently bind to the bare target column (r13 advice)
    val e3 = intercept[IllegalArgumentException] {
      g.sql("""MERGE INTO t USING (SELECT 1 AS k, 1 AS custkey,
              |'x' AS status, 1.0 AS totalprice) s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *
              |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET s.status = 'gone'""".stripMargin)
    }
    assert(e3.getMessage.contains("TARGET columns"))
  }

  test("DML against a durable table is a catalog commit; reopen sees it") {
    val wh = Files.createTempDirectory("graft_sql_wh_").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("orders_sql", "k",
      Seq((1L, "A"), (2L, "B")).toDF("k", "s"))
    val g = new GraftSql(spark).register("orders_sql", cat, "orders_sql")
    g.sql("UPDATE orders_sql SET s = 'U' WHERE k = 1")
    g.sql("INSERT INTO orders_sql VALUES (3, 'C')")
    val cat2 = new Catalog(spark, wh)
    val got = cat2.getTable("orders_sql").snapshot.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "U"), (2L, "B"), (3L, "C")))
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT routes to the engine's CHECK gate") {
    val wh = Files.createTempDirectory("graft_sql_ck_").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("ck_sql", "k", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val g = new GraftSql(spark).register("ck_sql", cat, "ck_sql")
    // Spark 4's OWN grammar parses the statement (AddCheckConstraint);
    // graft enforces it
    g.sql("ALTER TABLE ck_sql ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert(cat.constraints("ck_sql") === Map("v_pos" -> "v > 0"))
    val e = intercept[Exception] {
      g.sql("UPDATE ck_sql SET v = -1 WHERE k = 1")
    }
    assert(e.getMessage.contains("v_pos"))
    g.sql("ALTER TABLE ck_sql DROP CONSTRAINT v_pos")
    g.sql("UPDATE ck_sql SET v = -1 WHERE k = 1") // now passes
    assert(g.table("ck_sql").snapshot.where("v < 0").count() === 1)
    // DROP CONSTRAINT IF EXISTS on an absent name is a no-op
    g.sql("ALTER TABLE ck_sql DROP CONSTRAINT IF EXISTS nothere")
    // an in-session table has no catalog metadata to keep constraints in
    val g2 = fixture()
    val e2 = intercept[IllegalArgumentException] {
      g2.sql("ALTER TABLE t ADD CONSTRAINT c CHECK (totalprice > 0)")
    }
    assert(e2.getMessage.contains("in-session"))
  }

  test("reads pass through; unregistered tables are untouched") {
    val g = fixture()
    assert(g.sql("SELECT count(*) AS n FROM t").head().getLong(0) === 3L)
    // DML naming an unregistered table falls through to spark.sql, which
    // rejects it (no such v2 table) — never silently a no-op
    intercept[Exception] { g.sql("DELETE FROM nosuch WHERE 1=1").collect() }
  }

  test("unsupported shapes fail loud, with the reason") {
    val g = fixture()
    val e1 = intercept[IllegalArgumentException] {
      g.sql("""MERGE INTO t USING (SELECT 1 AS k, 1 AS custkey,
              |'x' AS status, 1.0 AS totalprice) s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET status = s.status""".stripMargin)
    }
    assert(e1.getMessage.contains("WHEN NOT MATCHED"))
    val e2 = intercept[IllegalArgumentException] {
      g.sql("""MERGE INTO t USING (SELECT 1 AS kk) s ON t.k = s.kk
              |WHEN MATCHED THEN DELETE
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e2.getMessage.contains("ON must equate the key"))
    // (INSERT OVERWRITE graduated from rejected to supported in r9 —
    // covered in the INSERT test above)
    // a DELETE gate on TARGET columns would silently rebind to the
    // same-named SOURCE column (inverting intent) — rejected loud
    val e4 = intercept[IllegalArgumentException] {
      g.sql("""MERGE INTO t tgt USING (SELECT 1 AS k, 1 AS custkey,
              |'x' AS status, 1.0 AS totalprice) s ON tgt.k = s.k
              |WHEN MATCHED AND tgt.status = 'old' THEN DELETE
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e4.getMessage.contains("SOURCE columns"))
  }

  private def durableFixture(): (GraftSql, Catalog) = {
    val wh = Files.createTempDirectory("graft_sql_call_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k",
      Seq((1L, 10L, "A", 100.0), (2L, 20L, "B", 200.0),
          (3L, 30L, "C", 300.0)).toDF("k", "custkey", "status", "totalprice"))
    (new GraftSql(spark).register("t", cat, "t"), cat)
  }

  test("CALL maintenance: optimize folds, vacuum trims, snapshot invariant") {
    val (g, cat) = durableFixture()
    g.sql("UPDATE t SET totalprice = totalprice + 1.0 WHERE k = 1")
    val before = rows(g)
    g.sql("CALL graft.optimize('t')")
    assert(rows(g) === before, "optimize must preserve the snapshot")
    // history survived the fold (unlike compact)
    assert(cat.getTable("t").asOfRelative(-1).count() === 3L)
    g.sql("UPDATE t SET status = 'Z' WHERE k = 2")
    g.sql("CALL graft.vacuum('t', 1)")
    assert(rows(g).map(_._3).toSet === Set("A", "Z", "C"))
  }

  test("CALL graft.purge erases by a SQL predicate string") {
    val (g, _) = durableFixture()
    g.sql("CALL graft.purge('t', 'custkey = 20')")
    assert(rows(g).map(_._1) === Seq(1L, 3L))
  }

  test("CALL graft.analyze returns (column, ndv) rows; history reads the log") {
    val (g, cat) = durableFixture()
    val stats = g.sql("CALL graft.analyze('t', 'status', 'custkey')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("status" -> 3L, "custkey" -> 3L))
    assert(g.sql("CALL graft.history('t')").columns.toSeq ===
      Seq("version", "commit_ts"))
    assert(cat != null)
  }

  test("CALL graft.refresh_mview / create_bloom / clone drive the lifecycle") {
    val (g, cat) = durableFixture()
    g.sql("CALL graft.create_mview('v', 't', 'status', 'totalprice')")
    g.register("v", cat, "v")
    g.sql("UPDATE t SET totalprice = totalprice + 10.0 WHERE k = 3")
    g.sql("CALL graft.refresh_mview('v')")
    val vRows = g.table("v").snapshot.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(vRows === Set(("A", 1L, 10000L), ("B", 1L, 20000L), ("C", 1L, 31000L)))
    g.sql("CALL graft.create_bloom('t', 'custkey')")
    assert(cat.bloomColsOf("t") === Seq("custkey"))
    g.sql("CALL graft.clone('t', 't2')")
    assert(cat.getTable("t2").snapshot.count() === 3L)
    // min/max measures through the procedure (r10): named trailing args
    g.sql("""CALL graft.create_mview('vmm', 't', 'status', 'totalprice',
            |min_col => 'totalprice', max_col => 'totalprice')""".stripMargin)
    val mm = g.table("vmm").snapshot
      .select("status", "minc_totalprice", "maxc_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mm === Set(("A", 10000L, 10000L), ("B", 20000L, 20000L),
      ("C", 31000L, 31000L)))
    // positional empty-string min slot spells a max-only view
    g.sql("CALL graft.create_mview('vmx', 't', 'status', 'totalprice', '', 'totalprice')")
    assert(g.table("vmx").snapshot.columns.toSeq ===
      Seq("status", "n_rows", "cents", "maxc_totalprice"))
  }

  test("a matching aggregate routes to the CURRENT view; stale falls back") {
    val (g, cat) = durableFixture()
    cat.createMaterializedView("v", "t", "status", "totalprice")
    g.register("v", cat, "v")
    val q = """SELECT status, count(*) AS n, sum(totalprice) AS s,
              |avg(totalprice) AS a FROM t GROUP BY status""".stripMargin
    def files(df: org.apache.spark.sql.DataFrame): String = {
      df.queryExecution.toRdd.count()
      df.queryExecution.executedPlan.toString
    }
    val routed = g.sql(q)
    assert(files(routed).contains("/v"),
      "expected the aggregate to read the VIEW's files")
    val expect = Set(("A", 1L, 100.0, 100.0), ("B", 1L, 200.0, 200.0),
      ("C", 1L, 300.0, 300.0))
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(rowsOf(routed) === expect)
    // STALE view (source committed, no refresh): must NOT route — and the
    // direct result reflects the new state
    g.sql("UPDATE t SET totalprice = totalprice + 1.0 WHERE k = 1")
    val direct = g.sql(q)
    assert(!files(direct).contains("/v"),
      "a stale view must never serve an aggregate")
    assert(rowsOf(direct) === Set(("A", 1L, 101.0, 101.0),
      ("B", 1L, 200.0, 200.0), ("C", 1L, 300.0, 300.0)))
    // refresh restores routing, now with the new totals
    g.sql("CALL graft.refresh_mview('v')")
    val rerouted = g.sql(q)
    assert(files(rerouted).contains("/v"))
    assert(rowsOf(rerouted) === rowsOf(direct))
    // non-maintainable shapes pass through untouched
    val filtered = g.sql(
      "SELECT status, count(*) AS n FROM t WHERE k > 1 GROUP BY status")
    assert(!files(filtered).contains("/v"))
    val minq = g.sql(
      "SELECT status, min(totalprice) AS m FROM t GROUP BY status")
    assert(!files(minq).contains("/v"))
  }

  test("VERSION AS OF / TIMESTAMP AS OF read past states; compose in joins") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_sql_tt_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k",
      Seq((1L, 10L, "A", 100.0), (2L, 20L, "B", 200.0))
        .toDF("k", "custkey", "status", "totalprice"))
    cat.commitAt("t", graft.core.Txn.empty
      .update(col("k") === 1L, Map("status" ->
        org.apache.spark.sql.functions.lit("X"))), ts = 1000L)
    cat.commitAt("t", graft.core.Txn.empty.delete(col("k") === 2L), ts = 2000L)
    val g = new GraftSql(spark).register("t", cat, "t")
    def states(sql: String) = g.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // absolute version 0 = base; 1 = after the update; current = post-delete
    assert(states("SELECT k, status FROM t VERSION AS OF 0") ===
      Set((1L, "A"), (2L, "B")))
    assert(states("SELECT k, status FROM t VERSION AS OF 1") ===
      Set((1L, "X"), (2L, "B")))
    assert(states("SELECT k, status FROM t") === Set((1L, "X")))
    // logical-clock timestamps resolve through the commit log
    assert(states("SELECT k, status FROM t TIMESTAMP AS OF 1500") ===
      Set((1L, "X"), (2L, "B")))
    // two versions of the SAME table join in one statement
    val diff = g.sql(
      """SELECT a.k, a.status AS old_s, b.status AS new_s
        |FROM t VERSION AS OF 0 a JOIN t VERSION AS OF 1 b ON a.k = b.k
        |WHERE a.status <> b.status""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(diff === Set((1L, "A", "X")))
    // a WALL-CLOCK string literal parses to UTC epoch millis and
    // resolves through the same commit log (stamps here are logical
    // 1000/2000 — i.e. millis just past the epoch, so a 1970 instant
    // between them lands on the first commit)
    assert(states("SELECT k, status FROM t TIMESTAMP AS OF '1970-01-01 00:00:01.5'") ===
      Set((1L, "X"), (2L, "B")))
    // and the TIMESTAMP-typed literal form (micros → millis) agrees
    assert(states("SELECT k, status FROM t TIMESTAMP AS OF TIMESTAMP '1970-01-01 00:00:01.5'") ===
      Set((1L, "X"), (2L, "B")))
    // loud failures: unparseable instant; in-session timestamp travel
    val e1 = intercept[IllegalArgumentException](
      g.sql("SELECT * FROM t TIMESTAMP AS OF 'not-a-time'"))
    assert(e1.getMessage.contains("cannot parse"))
    val g2 = fixture()
    val e2 = intercept[IllegalArgumentException](
      g2.sql("SELECT * FROM t TIMESTAMP AS OF 1500"))
    assert(e2.getMessage.contains("in-session"))
    // in-session VERSION AS OF works (no commit log needed)
    assert(g2.sql("SELECT k FROM t VERSION AS OF 0").count() === 3L)
  }

  test("table_changes reads batch CDC events; re-stamped ranges fail loud") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_sql_tc_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k",
      Seq((1L, 10L, "A", 100.0), (2L, 20L, "B", 200.0))
        .toDF("k", "custkey", "status", "totalprice"))
    cat.commit("t", graft.core.Txn.empty.update(col("k") === 1L,
      Map("totalprice" -> (col("totalprice") + org.apache.spark.sql.functions.lit(1.0)))))
    cat.commit("t", graft.core.Txn.empty.delete(col("k") === 2L))
    val g = new GraftSql(spark).register("t", cat, "t")
    def events(sql: String) = g.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // full feed (default upper bound = current version)
    assert(events("SELECT k, commit_ver, op FROM table_changes('t', 0)") ===
      Set((1L, 1L, "upsert"), (2L, 2L, "delete")))
    // bounded range + a composed filter
    assert(events(
      "SELECT k, commit_ver, op FROM table_changes('t', 1, 2) WHERE k = 2") ===
      Set((2L, 2L, "delete")))
    // Delta-compat inclusive `from` (r10): version 1's own commit emits —
    // table_changes('t', 1, inclusive => true) ≡ table_changes('t', 0)
    assert(events(
      "SELECT k, commit_ver, op FROM table_changes('t', 1, inclusive => true)") ===
      Set((1L, 1L, "upsert"), (2L, 2L, "delete")))
    // and the default exclusive bound is unchanged by inclusive => false
    assert(events(
      "SELECT k, commit_ver, op FROM table_changes('t', 1, inclusive => false)") ===
      Set((2L, 2L, "delete")))
    // ADVICE r10: Delta's common `startingVersion = 0` — inclusive from 0
    // clamps to the version floor and returns FULL history instead of
    // tripping the re-stamp guard with a misleading error
    assert(events(
      "SELECT k, commit_ver, op FROM table_changes('t', 0, inclusive => true)") ===
      Set((1L, 1L, "upsert"), (2L, 2L, "delete")))
    // the flag rejects wall-clock bounds (they are already at-or-after)
    val eIncl = intercept[IllegalArgumentException](g.sql(
      "SELECT * FROM table_changes('t', '1970-01-01 00:00:00', inclusive => true)").collect())
    assert(eIncl.getMessage.contains("version-number bounds"))
    // a physical rewrite re-stamps history: the pre-floor range must error
    cat.foldTail("t")
    val e = intercept[IllegalArgumentException](
      g.sql("SELECT * FROM table_changes('t', 0)").collect())
    assert(e.getMessage.contains("no longer addressable"))
    // in-session tables read the feed directly
    val g2 = fixture()
    g2.sql("UPDATE t SET totalprice = totalprice + 1.0 WHERE k = 3")
    assert(g2.sql("SELECT k, op FROM table_changes('t', 0)").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === Set((3L, "upsert")))
  }

  test("table_changes accepts wall-clock string bounds via the commit log") {
    import org.apache.spark.sql.functions.{col, lit}
    val wh = Files.createTempDirectory("graft_sql_tcts_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k",
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    // stamps are epoch millis: 1.0s and 2.0s past the epoch
    cat.commitAt("t", graft.core.Txn.empty.update(col("k") === 1L,
      Map("v" -> lit(11L))), ts = 1000L)
    cat.commitAt("t", graft.core.Txn.empty.delete(col("k") === 2L), ts = 2000L)
    val g = new GraftSql(spark).register("t", cat, "t")
    def events(sql: String) = g.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // from-instant between the commits → only the second commit's events
    assert(events("SELECT k, op FROM table_changes('t', '1970-01-01 00:00:01.5')") ===
      Set((2L, "delete")))
    // a [from, to] window in wall-clock terms: only the first commit
    assert(events("SELECT k, op FROM table_changes('t', " +
      "'1970-01-01 00:00:00.5', '1970-01-01 00:00:01.5')") ===
      Set((1L, "upsert")))
    // in-session tables have no commit log — loud
    val g2 = fixture()
    val e = intercept[IllegalArgumentException](
      g2.sql("SELECT * FROM table_changes('t', '1970-01-01 00:00:01')"))
    assert(e.getMessage.contains("in-session"))
  }

  test("CALL with named args and non-graft procedures") {
    val (g, _) = durableFixture()
    g.sql("CALL vacuum(tbl => 't', keep => 1)")  // unqualified + named args
    g.sql("CALL vacuum(keep => 1, tbl => 't')")  // named args are order-free
    val eN = intercept[IllegalArgumentException](
      g.sql("CALL vacuum(nope => 1, tbl => 't')"))
    assert(eN.getMessage.contains("unknown parameter"))
    // an in-session table refuses maintenance, loud
    val g2 = fixture()
    val e = intercept[IllegalArgumentException](g2.sql("CALL graft.optimize('t')"))
    assert(e.getMessage.contains("durable"))
    // a procedure graft does not own passes through (and fails in Spark's
    // analyzer, not silently in ours)
    intercept[Exception](g.sql("CALL some_catalog.not_ours('x')"))
    // assigning one parameter twice (positional+named, or named twice)
    // must not silently overwrite
    val eDup = intercept[IllegalArgumentException](
      g.sql("CALL vacuum('t', 1, keep => 2)"))
    assert(eDup.getMessage.contains("assigned twice"))
    val eDup2 = intercept[IllegalArgumentException](
      g.sql("CALL vacuum(tbl => 't', keep => 1, keep => 2)"))
    assert(eDup2.getMessage.contains("assigned twice"))
    // an integer literal past Int range must not silently truncate
    val eBig = intercept[IllegalArgumentException](
      g.sql("CALL vacuum('t', 4294967297)"))
    assert(eBig.getMessage.contains("int-range"))
  }

  private def twoTableFixture(): (GraftSql, Catalog) = {
    val wh = Files.createTempDirectory("graft_sql_txn_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("a", "k",
      Seq((1L, 10L, "A", 100.0), (2L, 20L, "B", 200.0),
          (3L, 30L, "C", 300.0)).toDF("k", "custkey", "status", "totalprice"))
    cat.createTable("b", "k",
      Seq((1L, "en", 5L), (2L, "zh", 7L)).toDF("k", "lang", "n"))
    (new GraftSql(spark).register("a", cat, "a").register("b", cat, "b"), cat)
  }

  test("BEGIN..COMMIT lands multi-statement DML as ONE atomic cross-table commit") {
    val (g, cat) = twoTableFixture()
    val aSeqBefore = cat.getTable("a").currentVersion
    g.sql("BEGIN")
    g.sql("UPDATE a SET status = 'U' WHERE k <= 2")
    g.sql("DELETE FROM a WHERE k = 3")       // composes on the same table
    g.sql("DELETE FROM b WHERE lang = 'zh'")
    // reads inside the transaction see their own staged writes (r10:
    // the RYOW overlay — the reference's Transaction.run semantics)
    assert(g.sql("SELECT count(*) AS n FROM a").head().getLong(0) === 2L)
    // but nothing is durable before COMMIT
    assert(cat.getTable("a").currentVersion === aSeqBefore)
    g.sql("COMMIT")
    assert(g.table("a").snapshot.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((1L, "U"), (2L, "U")))
    assert(g.table("b").snapshot.collect().map(_.getString(1)).toSeq ===
      Seq("en"))
    // statement order within a table held: both a-statements in one commit
    assert(cat.getTable("a").currentVersion === aSeqBefore + 2)
  }

  test("reads inside a transaction see earlier writes; isolation holds outside (r10 RYOW)") {
    val (g, cat) = twoTableFixture()
    g.sql("BEGIN")
    g.sql("UPDATE a SET status = 'RW', totalprice = totalprice + 1.0 WHERE k = 1")
    // the staged update is visible to this session's SQL reads...
    val mid = g.sql("SELECT k, status, totalprice FROM a WHERE status = 'RW'")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(mid.toSeq === Seq((1L, "RW", 101.0)))
    // ...and to a dependent write: the INSERT..SELECT copies the staged row
    g.sql("INSERT INTO a SELECT k + 100, custkey, 'CP', totalprice FROM a WHERE status = 'RW'")
    assert(g.sql("SELECT count(*) AS n FROM a").head().getLong(0) === 4L)
    // the durable state did not move — another reader still sees pre-txn
    assert(cat.getTable("a").snapshot.where("status = 'RW'").count() === 0L)
    g.sql("COMMIT")
    assert(g.table("a").snapshot.where("status IN ('RW','CP')").count() === 2L)
  }

  test("PARTITIONED BY + INSERT ... PARTITION: the SQL partition surface (r11)") {
    val wh = Files.createTempDirectory("graft_sql_part_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val g = new GraftSql(spark).attach(cat)
    g.sql("""CREATE TABLE pt (k BIGINT, cat STRING, v BIGINT) USING graft
            |OPTIONS ('key' = 'k') PARTITIONED BY (cat)""".stripMargin)
    assert(cat.partitionColOf("pt") === Some("cat"))
    g.sql("INSERT INTO pt VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)")
    // partition-scoped overwrite: only 'a' rows replaced
    g.sql("INSERT OVERWRITE pt PARTITION (cat = 'a') SELECT 10, 100")
    assert(g.sql("SELECT k, v FROM pt WHERE cat = 'a'").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((10L, 100L)))
    assert(g.sql("SELECT v FROM pt WHERE cat = 'b'").head().getLong(0) === 20L)
    // static-partition append fills the column
    g.sql("INSERT INTO pt PARTITION (cat = 'c') SELECT 20, 200")
    assert(g.sql("SELECT cat FROM pt WHERE k = 20").head().getString(0) === "c")
    // guards: dynamic partition, wrong column, unpartitioned target,
    // in-session partitioned create
    assert(intercept[IllegalArgumentException](g.sql(
      "INSERT OVERWRITE pt PARTITION (cat) SELECT 1, 'a', 1"))
      .getMessage.contains("dynamic"))
    assert(intercept[IllegalArgumentException](g.sql(
      "INSERT INTO pt PARTITION (v = 5) SELECT 1, 'a'"))
      .getMessage.contains("partitioned by (cat)"))
    g.sql("""CREATE TABLE flat (k BIGINT, v BIGINT) USING graft
            |OPTIONS ('key' = 'k')""".stripMargin)
    assert(intercept[IllegalArgumentException](g.sql(
      "INSERT INTO flat PARTITION (v = 5) SELECT 1"))
      .getMessage.contains("not partitioned"))
    val g2 = new GraftSql(spark) // no attached catalog
    assert(intercept[IllegalArgumentException](g2.sql(
      """CREATE TABLE mem (k BIGINT, c STRING) USING graft
        |OPTIONS ('key' = 'k') PARTITIONED BY (c)""".stripMargin))
      .getMessage.contains("durable"))
    // unsupported transform partitioning rejects loud (bucket(n, col)
    // and days(col) are supported as of r12 — PartitionSpec covers them)
    assert(intercept[IllegalArgumentException](g.sql(
      """CREATE TABLE bt (k BIGINT, c STRING) USING graft
        |OPTIONS ('key' = 'k') PARTITIONED BY (truncate(4, c))""".stripMargin))
      .getMessage.contains("identity"))
  }

  test("dynamic partition overwrite replaces exactly the touched partitions (r11)") {
    val wh = Files.createTempDirectory("graft_sql_pdyn_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val g = new GraftSql(spark).attach(cat)
    g.sql("""CREATE TABLE pd (k BIGINT, cat STRING, v BIGINT) USING graft
            |OPTIONS ('key' = 'k') PARTITIONED BY (cat)""".stripMargin)
    g.sql("INSERT INTO pd VALUES (1,'a',10), (2,'b',20), (3,'c',30), (4,'a',40)")
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(conf, "static")
    try {
      spark.conf.set(conf, "dynamic")
      // rows touch 'a' and 'b': both replaced, 'c' untouched, ONE commit
      g.sql("INSERT OVERWRITE pd VALUES (9,'a',90), (8,'b',80)")
      assert(g.sql("SELECT cat, k, v FROM pd ORDER BY cat").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
        Seq(("a", 9L, 90L), ("b", 8L, 80L), ("c", 3L, 30L)))
      // atomic + versioned: the pre-overwrite state is one version back
      assert(g.sql("SELECT count(*) FROM pd VERSION AS OF 1")
        .head().getLong(0) === 4L)
      // NULL partition value rejects loud
      assert(intercept[IllegalArgumentException](g.sql(
        "INSERT OVERWRITE pd VALUES (7, NULL, 70)"))
        .getMessage.contains("NULL partition values"))
      // unpartitioned table ignores the conf: ANSI truncate-all
      g.sql("""CREATE TABLE pflat (k BIGINT, v BIGINT) USING graft
              |OPTIONS ('key' = 'k')""".stripMargin)
      g.sql("INSERT INTO pflat VALUES (1, 1), (2, 2)")
      g.sql("INSERT OVERWRITE pflat VALUES (5, 5)")
      assert(g.sql("SELECT k FROM pflat").collect().map(_.getLong(0))
        .toSeq === Seq(5L))
    } finally spark.conf.set(conf, prev)
    // static mode (default): no-clause overwrite truncates ALL partitions
    g.sql("INSERT OVERWRITE pd VALUES (6,'z',60)")
    assert(g.sql("SELECT cat, k FROM pd").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("z", 6L)))
  }

  test("BEGIN..COMMIT spans catalogs: one cross-catalog commit point (r12)") {
    val whA = Files.createTempDirectory("graft_sql_gx_a_").toString
    val whB = Files.createTempDirectory("graft_sql_gx_b_").toString
    val ca = new Catalog(spark, whA, autoCompact = false)
    val cb = new Catalog(spark, whB, autoCompact = false)
    ca.createTable("gta", "k", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    cb.createTable("gtb", "k", Seq((1L, 100L)).toDF("k", "w"))
    val g = new GraftSql(spark)
      .register("gta", ca, "gta").register("gtb", cb, "gtb")
    g.sql("BEGIN")
    g.sql("UPDATE gta SET v = v + 1 WHERE k = 1")
    g.sql("INSERT INTO gtb VALUES (2, 200)")
    // RYOW across BOTH catalogs mid-transaction
    assert(g.sql("SELECT sum(v) FROM gta").head().getLong(0) === 31L)
    assert(g.sql("SELECT count(*) FROM gtb").head().getLong(0) === 2L)
    // nothing durable yet
    assert(ca.getTable("gta").snapshot.where($"k" === 1L)
      .head().getLong(1) === 10L)
    g.sql("COMMIT")
    // both landed; fresh handles over both warehouses agree
    assert(new Catalog(spark, whA).getTable("gta").snapshot
      .where($"k" === 1L).head().getLong(1) === 11L)
    assert(new Catalog(spark, whB).getTable("gtb").snapshot.count() === 2L)
    // a constraint violation in ONE catalog aborts the WHOLE transaction
    cb.addConstraint("gtb", "w_pos", "w > 0")
    g.sql("BEGIN")
    g.sql("UPDATE gta SET v = v + 1000 WHERE k = 2")
    g.sql("INSERT INTO gtb VALUES (3, -5)")
    intercept[Exception] { g.sql("COMMIT") }
    assert(ca.getTable("gta").snapshot.where($"k" === 2L)
      .head().getLong(1) === 20L, "sibling catalog mutated by aborted txn")
    assert(cb.getTable("gtb").snapshot.count() === 2L)
  }

  test("multi-column PARTITIONED BY: create, scoped insert, route (r12)") {
    val wh = Files.createTempDirectory("graft_sql_pmulti_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val g = new GraftSql(spark).attach(cat)
    g.sql("""CREATE TABLE pm (k BIGINT, region STRING, cat STRING, v BIGINT)
            |USING graft OPTIONS ('key' = 'k')
            |PARTITIONED BY (region, cat)""".stripMargin)
    g.sql("""INSERT INTO pm VALUES (1,'a','x',10), (2,'a','y',20),
            |(3,'b','x',30), (4,'b','y',40)""".stripMargin)
    assert(cat.partitionColsOf("pm") === Seq("region", "cat"))
    // full-tuple static PARTITION overwrite scopes to ONE leaf directory
    g.sql("INSERT OVERWRITE pm PARTITION (region = 'a', cat = 'x') SELECT 9, 90")
    assert(g.sql("SELECT k FROM pm ORDER BY k").collect().map(_.getLong(0))
      .toSeq === Seq(2L, 3L, 4L, 9L))
    // prefix-only PARTITION overwrite scopes to the whole subtree
    g.sql("INSERT INTO pm VALUES (5,'a','x',50)")
    g.sql("INSERT OVERWRITE pm PARTITION (region = 'a') SELECT 7, 'x', 70")
    assert(g.sql("SELECT k FROM pm ORDER BY k").collect().map(_.getLong(0))
      .toSeq === Seq(3L, 4L, 7L))
    // dynamic overwrite replaces exactly the touched TUPLES
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(conf, "static")
    try {
      spark.conf.set(conf, "dynamic")
      g.sql("INSERT OVERWRITE pm VALUES (8,'b','x',80)")
      assert(g.sql("SELECT k FROM pm ORDER BY k").collect().map(_.getLong(0))
        .toSeq === Seq(4L, 7L, 8L), "(b,x) replaced; (b,y) and (a,x) kept")
    } finally spark.conf.set(conf, prev)
    // SQL reads route onto the pruned scan for any subset of the columns
    // (fold first: rows land in the flat tail until compaction lays out
    // the partition directories)
    cat.foldTail("pm")
    val df = g.sql("SELECT k, v FROM pm WHERE cat = 'x' AND v > 0 ORDER BY k")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(7L, 8L))
    assert(df.queryExecution.executedPlan.toString.contains("_pd1"),
      "expected the suffix-level directory filter in the routed plan")
    // type-mismatched literal does NOT route (would prune wrong) but
    // still answers correctly through the plain view read
    val mis = g.sql("SELECT k FROM pm WHERE region = 1")
    assert(!mis.queryExecution.executedPlan.toString.contains("_pd0"),
      "int literal against string partition column must not route")
  }

  test("PARTITIONED BY (days(ts)): SQL create + transform guards (r12)") {
    val wh = Files.createTempDirectory("graft_sql_pdays_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val g = new GraftSql(spark).attach(cat)
    g.sql("""CREATE TABLE pdy (k BIGINT, ts BIGINT, v BIGINT) USING graft
            |OPTIONS ('key' = 'k') PARTITIONED BY (days(ts))""".stripMargin)
    val day = 86400000000000L
    g.sql(s"INSERT INTO pdy VALUES (1, ${2 * day + 5}, 10), " +
      s"(2, ${3 * day + 9}, 20), (3, ${2 * day + 1}, 30)")
    assert(cat.partitionFuncsOf("pdy") === Seq("days"))
    assert(g.sql("SELECT count(*) FROM pdy").head().getLong(0) === 3L)
    assert(cat.timeSliceSnapshot("pdy", 2 * day, 3 * day)
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    // a static PARTITION pin on a transformed level rejects loud
    assert(intercept[IllegalArgumentException](g.sql(
      s"INSERT OVERWRITE pdy PARTITION (ts = 5) SELECT 9, 90"))
      .getMessage.contains("TRANSFORMED"))
    // dynamic overwrite on a transformed level rejects loud
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(conf, "static")
    try {
      spark.conf.set(conf, "dynamic")
      assert(intercept[IllegalArgumentException](g.sql(
        s"INSERT OVERWRITE pdy VALUES (9, ${2 * day}, 90)"))
        .getMessage.contains("transformed"))
    } finally spark.conf.set(conf, prev)
    // a bounded ts RANGE routes onto the day-pruned slice read; the
    // exact predicate is re-applied above (pure scan substitution)
    cat.foldTail("pdy")
    g.register("pdy", cat, "pdy") // refresh the view over the folded base
    val qr = g.sql(s"SELECT k FROM pdy WHERE ts >= ${2 * day} " +
      s"AND ts < ${3 * day} ORDER BY k")
    assert(qr.collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(qr.queryExecution.executedPlan.toString.contains("substring(_pd"),
      "a bounded ts range must route onto the day directories")
    // ts equality routes too (a one-ns slice [x, x+1) is value-correct)
    val qe = g.sql(s"SELECT k FROM pdy WHERE ts = ${2 * day + 5}")
    assert(qe.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(qe.queryExecution.executedPlan.toString.contains("substring(_pd"))
    // a HALF-open range (one bound) does not route — nothing to prune to
    val qh = g.sql(s"SELECT k FROM pdy WHERE ts >= ${2 * day} ORDER BY k")
    assert(qh.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(!qh.queryExecution.executedPlan.toString.contains("substring(_pd"))
    // unsupported transforms still reject loud
    assert(intercept[IllegalArgumentException](g.sql(
      """CREATE TABLE bm (k BIGINT, ts BIGINT) USING graft
        |OPTIONS ('key' = 'k') PARTITIONED BY (months(ts))""".stripMargin))
      .getMessage.contains("bucket(n, col) only"))
  }

  test("dynamic overwrite pins the source once: tombstones match inserts (r12)") {
    val wh = Files.createTempDirectory("graft_sql_pdyn2_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val g = new GraftSql(spark).attach(cat)
    g.sql("""CREATE TABLE pd2 (k BIGINT, cat STRING, v BIGINT) USING graft
            |OPTIONS ('key' = 'k') PARTITIONED BY (cat)""".stripMargin)
    g.sql("INSERT INTO pd2 VALUES (1,'a',10), (2,'b',20)")
    // a genuinely nondeterministic source: first three evaluations say
    // 'a', every later one says 'b'. If the engine derived the tombstone
    // set from one evaluation and inserted a SECOND evaluation, the rows
    // would land in 'b' (never tombstoned) next to the old 'b' row.
    val ctr = new java.util.concurrent.atomic.AtomicInteger()
    spark.udf.register("flip_nd",
      org.apache.spark.sql.functions.udf(() =>
        if (ctr.getAndIncrement() < 3) "a" else "b").asNondeterministic())
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(conf, "static")
    try {
      spark.conf.set(conf, "dynamic")
      g.sql("INSERT OVERWRITE pd2 SELECT id + 100, flip_nd(), id " +
        "FROM range(0, 3, 1, 1)")
    } finally spark.conf.set(conf, prev)
    val got = g.sql("SELECT cat, k FROM pd2 ORDER BY cat, k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 100L), ("a", 101L), ("a", 102L), ("b", 2L)))
  }

  test("WHERE partcol = literal routes SQL reads onto the pruned scan (r11)") {
    val wh = Files.createTempDirectory("graft_sql_proute_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    import org.apache.spark.sql.functions.lit
    cat.createTable("pr", "k",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, "c", 40L))
        .toDF("k", "cat", "v"),
      partitionBy = Some("cat"))
    cat.commit("pr", graft.core.Txn.empty.update(
      org.apache.spark.sql.functions.col("k") === 1L, Map("v" -> lit(11L))))
    val g = new GraftSql(spark).register("pr", cat, "pr")
    val routed = g.sql("SELECT k, v FROM pr WHERE cat = 'a' AND v > 5")
    assert(routed.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq === Seq((1L, 11L), (3L, 30L)))
    // the plan carries the directory filter — proof the pruned scan won
    routed.collect()
    def pruned(df: org.apache.spark.sql.DataFrame): Boolean =
      "_pd#\\d+ = pa".r.findFirstIn(
        df.queryExecution.executedPlan.toString).isDefined
    assert(pruned(routed), "SQL read did not route onto the pruned scan")
    // aliased + qualified spelling routes too
    val aliased = g.sql("SELECT t.v FROM pr AS t WHERE t.cat = 'a'")
    assert(aliased.collect().map(_.getLong(0)).toSet === Set(11L, 30L))
    assert(pruned(aliased))
    // a non-literal or non-partition filter falls through to the view
    val direct = g.sql("SELECT v FROM pr WHERE v = 20")
    assert(direct.head().getLong(0) === 20L)
    assert(!pruned(direct))
    // inside a transaction with staged writes the RYOW overlay wins —
    // the staged update must be visible, never the stale pruned scan
    g.sql("BEGIN")
    g.sql("UPDATE pr SET v = 99 WHERE k = 3")
    assert(g.sql("SELECT v FROM pr WHERE cat = 'a' AND k = 3")
      .head().getLong(0) === 99L)
    g.sql("ROLLBACK")
  }

  test("mid-transaction reads hold their value when evaluated AFTER commit " +
      "under cache invalidation (r11 — the driver-gate flake)") {
    val wh = Files.createTempDirectory("graft_sql_ryow_env_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("a", "k",
      Seq((1L, 10L, "A", 100.0), (2L, 20L, "B", 200.0),
          (3L, 30L, "C", 300.0)).toDF("k", "custkey", "status", "totalprice"))
    val g = new GraftSql(spark).register("a", cat, "a")
    g.sql("BEGIN")
    g.sql("UPDATE a SET status = 'RW', totalprice = totalprice + 5.0 WHERE k <= 2")
    // the mid frame is NOT collected here — it must be safe to evaluate
    // at any later point, in any cache state (the r10 full-sweep flake:
    // a lazy overlay's pinned file listing went stale under unrelated
    // catalog traffic and the frame silently re-read post-commit state)
    val mid = g.sql(
      "SELECT count(*) AS n, sum(totalprice) AS v FROM a WHERE status = 'RW'")
    g.sql("INSERT INTO a SELECT k + 100, custkey, 'CP', totalprice FROM a " +
      "WHERE status = 'RW'")
    g.sql("DELETE FROM a WHERE status = 'RW' AND k = 2")
    g.sql("COMMIT")
    // adversarial environment: drop every cached relation and re-list the
    // table's files, then touch the durable state again
    spark.catalog.clearCache()
    spark.catalog.refreshByPath(wh)
    g.sql("UPDATE a SET totalprice = totalprice + 1000.0 WHERE status = 'CP'")
    // the mid frame still reports the PRE-commit overlay: both staged
    // rows, at the staged (not post-commit) prices
    val r = mid.head()
    assert(r.getLong(0) === 2L, "mid frame must see both staged RW rows")
    assert(math.abs(r.getDouble(1) - (105.0 + 205.0)) < 1e-9,
      s"mid frame re-read post-commit state: ${r.getDouble(1)}")
    // and the staged INSERT..SELECT copied the overlay values, untouched
    // by the delete that followed it in the same transaction
    assert(g.table("a").snapshot.where("status = 'CP'").count() === 2L)
  }

  test("the RYOW overlay base pins at FIRST stash — a concurrent commit " +
      "mid-transaction cannot shift reads between statements (ADVICE r10)") {
    val (g, cat) = twoTableFixture()
    g.sql("BEGIN")
    g.sql("UPDATE a SET status = 'T1' WHERE k = 1")
    // another writer commits to the SAME durable table mid-transaction
    cat.commit("a", graft.core.Txn.empty.update(
      org.apache.spark.sql.functions.col("k") === 3L,
      Map("status" -> org.apache.spark.sql.functions.lit("X"))))
    // a second statement re-registers the overlay — it must fold over the
    // base pinned at BEGIN-time, not the shifted durable state
    g.sql("UPDATE a SET status = 'T2' WHERE k = 2")
    assert(g.sql("SELECT status FROM a WHERE k = 3").head().getString(0)
      === "C", "overlay base shifted to the concurrent commit")
    g.sql("ROLLBACK")
    // outside the transaction the concurrent commit is of course visible
    assert(g.sql("SELECT status FROM a WHERE k = 3").head().getString(0)
      === "X")
  }

  test("ROLLBACK discards everything; constraint violation aborts the WHOLE transaction") {
    val (g, cat) = twoTableFixture()
    g.sql("BEGIN")
    g.sql("UPDATE a SET status = 'ZZ' WHERE k = 1")
    g.sql("DELETE FROM b WHERE lang = 'en'")
    g.sql("ROLLBACK")
    assert(g.table("a").snapshot.where("status = 'ZZ'").count() === 0L)
    assert(g.table("b").snapshot.count() === 2L)
    // ROLLBACK also tears down the RYOW overlays: the registered views
    // revert to the durable snapshots
    assert(g.sql("SELECT count(*) AS n FROM b").head().getLong(0) === 2L)
    assert(g.sql("SELECT count(*) AS n FROM a WHERE status = 'ZZ'")
      .head().getLong(0) === 0L)
    // a CHECK violation on ONE table at COMMIT rolls back BOTH tables'
    // statements — the staged commit is both-or-neither
    cat.addConstraint("a", "price_pos", "totalprice > 0.0")
    g.sql("BEGIN")
    g.sql("DELETE FROM b WHERE lang = 'en'")
    g.sql("UPDATE a SET totalprice = -1.0 WHERE k = 1")
    val e = intercept[Exception](g.sql("COMMIT"))
    assert(e.getMessage.contains("price_pos"))
    assert(g.table("b").snapshot.count() === 2L,
      "the clean table's statement must not survive the aborted transaction")
    assert(g.table("a").snapshot.where("totalprice < 0").count() === 0L)
    // the abort also reverted the RYOW overlays to the durable snapshots
    assert(g.sql("SELECT count(*) AS n FROM b").head().getLong(0) === 2L)
    // the failed COMMIT cleared the transaction: new statements autocommit
    g.sql("UPDATE a SET status = 'OK' WHERE k = 1")
    assert(g.table("a").snapshot.where("status = 'OK'").count() === 1L)
  }

  test("transaction guards: nested BEGIN, bare COMMIT, CALL/ALTER/non-graft DML inside") {
    val (g, _) = twoTableFixture()
    intercept[IllegalArgumentException](g.sql("COMMIT"))
    intercept[IllegalArgumentException](g.sql("ROLLBACK"))
    g.sql("BEGIN")
    intercept[IllegalArgumentException](g.sql("BEGIN"))
    val eCall = intercept[IllegalArgumentException](
      g.sql("CALL graft.optimize('a')"))
    assert(eCall.getMessage.contains("not transactional"))
    val eAlter = intercept[IllegalArgumentException](
      g.sql("ALTER TABLE a ADD CONSTRAINT c CHECK (totalprice > 0)"))
    assert(eAlter.getMessage.contains("not transactional"))
    val eDml = intercept[IllegalArgumentException](
      g.sql("DELETE FROM not_registered WHERE 1=1"))
    assert(eDml.getMessage.contains("unregistered"))
    g.sql("ROLLBACK")
    // empty transaction commits as a no-op
    g.sql("BEGIN"); g.sql("COMMIT")
    // in-session tables cannot join the staged commit
    val gs = fixture()
    gs.sql("BEGIN")
    val eSess = intercept[IllegalArgumentException](
      gs.sql("DELETE FROM t WHERE k = 1"))
    assert(eSess.getMessage.contains("in-session"))
    gs.sql("ROLLBACK")
  }

  test("a WHERE over the group column routes onto the view as a view-side filter") {
    val (g, cat) = durableFixture()
    cat.createMaterializedView("v", "t", "status", "totalprice")
    g.register("v", cat, "v")
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      df.queryExecution.toRdd.count()
      df.queryExecution.executedPlan.toString
    }
    val q = """SELECT status, count(*) AS n, sum(totalprice) AS s
              |FROM t WHERE status = 'B' GROUP BY status""".stripMargin
    val routed = g.sql(q)
    assert(plan(routed).contains("/v"),
      "a group-column WHERE must route as a view-side filter")
    assert(routed.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set(("B", 1L, 200.0)))
    // IN predicates over the group column route too
    val routedIn = g.sql("""SELECT status, count(*) AS n FROM t
                           |WHERE status IN ('A','C') GROUP BY status""".stripMargin)
    assert(plan(routedIn).contains("/v"))
    assert(routedIn.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("A", 1L), ("C", 1L)))
    // a WHERE naming a NON-group column must NOT route
    val direct = g.sql("""SELECT status, count(*) AS n FROM t
                         |WHERE k > 1 GROUP BY status""".stripMargin)
    assert(!plan(direct).contains("/v"))
    // HAVING routes too: aggregates in the predicate translate onto the
    // view's maintained columns
    val having = g.sql("""SELECT status, count(*) AS n, sum(totalprice) AS s
                         |FROM t GROUP BY status
                         |HAVING sum(totalprice) > 150.0 AND count(*) >= 1""".stripMargin)
    assert(plan(having).contains("/v"),
      "a translatable HAVING must route onto the view")
    assert(having.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set(("B", 1L, 200.0), ("C", 1L, 300.0)))
    // WHERE + HAVING compose on the routed path
    val both = g.sql("""SELECT status, count(*) AS n FROM t
                       |WHERE status IN ('A','B') GROUP BY status
                       |HAVING count(*) >= 1""".stripMargin)
    assert(plan(both).contains("/v"))
    assert(both.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("A", 1L), ("B", 1L)))
    // a HAVING over a non-maintained aggregate must NOT route
    val minHaving = g.sql("""SELECT status, count(*) AS n FROM t
                            |GROUP BY status HAVING min(totalprice) > 0""".stripMargin)
    assert(!plan(minHaving).contains("/v"))
    // a user alias shadowing a view-internal measure name (n_rows /
    // cents) would capture the translated predicate — the statement must
    // take the direct path and still answer correctly (ADVICE r9)
    val shadow = g.sql("""SELECT status, sum(totalprice) AS n_rows FROM t
                         |GROUP BY status HAVING count(*) >= 1""".stripMargin)
    assert(!plan(shadow).contains("/v"),
      "an n_rows-shadowing alias must not route")
    assert(shadow.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ===
      Set(("A", 100.0), ("B", 200.0), ("C", 300.0)))
  }

  test("min/max aggregates route onto a min/max-maintained view (r10)") {
    val (g, cat) = durableFixture()
    cat.createMaterializedView("vx", "t", Seq("status"), Seq("totalprice"),
      minCols = Seq("totalprice"), maxCols = Seq("totalprice"))
    g.register("vx", cat, "vx")
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      df.queryExecution.toRdd.count()
      df.queryExecution.executedPlan.toString
    }
    val q = g.sql("""SELECT status, min(totalprice) AS lo,
                    |max(totalprice) AS hi, count(*) AS n
                    |FROM t GROUP BY status""".stripMargin)
    assert(plan(q).contains("/vx"), "min/max must serve from the view")
    assert(q.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet ===
      Set(("A", 100.0, 100.0, 1L), ("B", 200.0, 200.0, 1L),
          ("C", 300.0, 300.0, 1L)))
    // HAVING over a maintained max routes too
    val h = g.sql("""SELECT status, count(*) AS n FROM t GROUP BY status
                    |HAVING max(totalprice) > 150.0""".stripMargin)
    assert(plan(h).contains("/vx"))
    assert(h.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("B", 1L), ("C", 1L)))
    // after an extremum-deleting write + refresh, routing still serves
    // the (rescanned) truth
    g.sql("DELETE FROM t WHERE k = 3")
    cat.refreshMaterializedView("vx")
    val q2 = g.sql("""SELECT status, max(totalprice) AS hi FROM t
                     |GROUP BY status""".stripMargin)
    assert(plan(q2).contains("/vx"))
    assert(q2.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ===
      Set(("A", 100.0), ("B", 200.0)))
    // a min over a NON-maintained column must not route
    val direct = g.sql("""SELECT status, min(custkey) AS m FROM t
                         |GROUP BY status""".stripMargin)
    assert(!plan(direct).contains("/vx"))
    // the dashboard top-n over a maintained max routes end to end
    val topn = g.sql("""SELECT status, max(totalprice) AS hi FROM t
                       |GROUP BY status ORDER BY hi DESC LIMIT 1""".stripMargin)
    assert(plan(topn).contains("/vx"))
    assert(topn.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("B", 200.0)))
  }

  test("ORDER BY / LIMIT above a routable aggregate routes — the dashboard top-n") {
    val (g, cat) = durableFixture()
    cat.createMaterializedView("v", "t", "status", "totalprice")
    g.register("v", cat, "v")
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      df.queryExecution.toRdd.count()
      df.queryExecution.executedPlan.toString
    }
    // the full dashboard shape: WHERE + HAVING + ORDER BY alias + LIMIT
    val topn = g.sql("""SELECT status, count(*) AS n, sum(totalprice) AS s
                       |FROM t GROUP BY status HAVING count(*) >= 1
                       |ORDER BY s DESC LIMIT 2""".stripMargin)
    assert(plan(topn).contains("/v"), "top-n over a current view must route")
    assert(topn.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq(("C", 1L, 300.0), ("B", 1L, 200.0)))
    // ordinal sort keys route; LIMIT without ORDER BY routes
    val ord = g.sql("""SELECT status, sum(totalprice) AS s FROM t
                      |GROUP BY status ORDER BY 2 ASC""".stripMargin)
    assert(plan(ord).contains("/v"))
    assert(ord.collect().map(_.getString(0)).toSeq === Seq("A", "B", "C"))
    val lim = g.sql("SELECT status, count(*) AS n FROM t GROUP BY status LIMIT 1")
    assert(plan(lim).contains("/v"))
    assert(lim.collect().length === 1)
    // an aggregate CALL in the ORDER BY is not an output column — direct
    val exprSort = g.sql("""SELECT status, count(*) AS n FROM t
                           |GROUP BY status ORDER BY sum(totalprice) DESC""".stripMargin)
    assert(!plan(exprSort).contains("/v"))
    // stale view: the sorted/limited shape falls back to direct too
    g.sql("UPDATE t SET totalprice = totalprice + 1.0 WHERE k = 1")
    val afterWrite = g.sql("""SELECT status, sum(totalprice) AS s FROM t
                             |GROUP BY status ORDER BY s DESC LIMIT 1""".stripMargin)
    assert(!plan(afterWrite).contains("/v"))
    assert(afterWrite.collect().map(r =>
      (r.getString(0), r.getDouble(1))).toSeq === Seq(("C", 300.0)))
  }

  test("composite-group multi-measure views route and refresh") {
    val wh = Files.createTempDirectory("graft_sql_mvm_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k",
      Seq((1L, "A", "x", 10.0, 1.0), (2L, "A", "y", 20.0, 2.0),
          (3L, "B", "x", 30.0, 3.0), (4L, "A", "x", 40.0, 4.0))
        .toDF("k", "g1", "g2", "m1", "m2"))
    val g = new GraftSql(spark).register("t", cat, "t")
    g.sql("CALL graft.create_mview('v', 't', 'g1, g2', 'm1, m2')")
    // create_mview auto-registered the view: SQL-only lifecycle holds
    assert(g.table("v").snapshot.count() === 3L)
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      df.queryExecution.toRdd.count()
      df.queryExecution.executedPlan.toString
    }
    val q = """SELECT g1, g2, count(*) AS n, sum(m1) AS s1, avg(m2) AS a2
              |FROM t GROUP BY g2, g1""".stripMargin // order-free group set
    val routed = g.sql(q)
    assert(plan(routed).contains("/v"))
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    val expect = Set(("A", "x", 2L, 50.0, 2.5), ("A", "y", 1L, 20.0, 2.0),
      ("B", "x", 1L, 30.0, 3.0))
    assert(rowsOf(routed) === expect)
    // differential refresh across a group migration, then re-route
    g.sql("UPDATE t SET g2 = 'y', m1 = 15.0 WHERE k = 1")
    g.sql("CALL graft.refresh_mview('v')")
    val after = g.sql(q)
    assert(plan(after).contains("/v"))
    assert(rowsOf(after) === Set(("A", "x", 1L, 40.0, 4.0),
      ("A", "y", 2L, 35.0, 1.5), ("B", "x", 1L, 30.0, 3.0)))
  }

  test("CALL graft.restore rewinds as a new commit; DROP TABLE completes the lifecycle") {
    val (g, cat) = durableFixture()
    g.sql("UPDATE t SET totalprice = totalprice + 1.0 WHERE k = 1")
    g.sql("CALL graft.restore('t', -1)")
    // restore appended the pre-update state as a NEW commit
    assert(rows(g).head === ((1L, 10L, "A", 100.0)))
    assert(cat.getTable("t").currentVersion === 2L,
      "restore must append, never rewrite history")
    // DROP TABLE deletes the durable table and deregisters the name
    g.sql("DROP TABLE t")
    intercept[IllegalArgumentException](g.table("t"))
    assert(!cat.tableNames.contains("t"))
    // an in-session drop just deregisters the handle
    val g2 = fixture()
    g2.sql("DROP TABLE t")
    intercept[IllegalArgumentException](g2.table("t"))
  }

  test("CREATE TABLE USING graft: empty schema, CTAS, adopt, drop — full SQL lifecycle") {
    val wh = Files.createTempDirectory("graft_sql_create_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val g = new GraftSql(spark).attach(cat)
    // empty keyed table from the column list, then DML through the door
    g.sql("CREATE TABLE ct (k BIGINT, v BIGINT, s STRING) USING graft " +
      "OPTIONS ('key' = 'k')")
    assert(cat.tableNames.contains("ct"))
    g.sql("INSERT INTO ct VALUES (1, 10, 'a'), (2, 20, 'b')")
    g.sql("UPDATE ct SET v = 99 WHERE k = 2")
    assert(g.table("ct").snapshot.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq((1L, 10L, "a"), (2L, 99L, "b")))
    // CTAS from any analyzable query (here the registered snapshot view)
    g.sql("CREATE TABLE ct2 USING graft OPTIONS ('key' = 'k') " +
      "AS SELECT k, v * 2 AS w FROM ct")
    assert(g.table("ct2").snapshot.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 20L), (2L, 198L)))
    // IF NOT EXISTS is a no-op on a registered name; plain CREATE is loud
    g.sql("CREATE TABLE IF NOT EXISTS ct (k BIGINT) USING graft")
    intercept[IllegalArgumentException](
      g.sql("CREATE TABLE ct (k BIGINT) USING graft"))
    // a fresh session ADOPTS an existing durable table via IF NOT EXISTS
    val g2 = new GraftSql(spark).attach(cat)
    g2.sql("CREATE TABLE IF NOT EXISTS ct2 (k BIGINT) USING graft")
    assert(g2.table("ct2").snapshot.count() === 2L)
    // default key = first column; no attached catalog → in-session
    val g3 = new GraftSql(spark)
    g3.sql("CREATE TABLE mem USING graft AS SELECT 5 AS k, 'x' AS s")
    assert(g3.table("mem").snapshot.count() === 1L)
    // non-graft CREATE passes through to Spark untouched (lands in
    // Spark's own catalog, never graft's)
    g3.sql("CREATE TABLE plain_tbl (k BIGINT) USING parquet")
    assert(spark.catalog.tableExists("plain_tbl"))
    assert(!cat.tableNames.contains("plain_tbl"))
    spark.sql("DROP TABLE plain_tbl")
    // guards: PARTITIONED BY, unknown options, bad key, inline constraint
    intercept[IllegalArgumentException](g3.sql(
      "CREATE TABLE p1 (k BIGINT, d STRING) USING graft PARTITIONED BY (d)"))
    intercept[IllegalArgumentException](g3.sql(
      "CREATE TABLE p2 (k BIGINT) USING graft OPTIONS ('zkey' = 'k')"))
    intercept[IllegalArgumentException](g3.sql(
      "CREATE TABLE p3 (k BIGINT) USING graft OPTIONS ('key' = 'nope')"))
    // DROP completes the lifecycle
    g.sql("DROP TABLE ct2")
    assert(!cat.tableNames.contains("ct2"))
  }

  test("qualified time-travel identifiers are NOT hijacked by name collision") {
    val (g, _) = durableFixture()
    // `t` is registered, but catalog.db.t names some OTHER table — the
    // splice must let it fall through to spark.sql (which rejects the
    // unknown table) instead of silently serving graft's `t`
    intercept[Exception](
      g.sql("SELECT * FROM spark_catalog.nosuchdb.t VERSION AS OF 0").collect())
  }

  test("SHOW TABLES IN graft lists registrations; DESCRIBE reports the live schema") {
    val wh = Files.createTempDirectory("graft_sql_show_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("d", "k", Seq((1L, "x")).toDF("k", "v"))
    val g = fixture().register("d", cat, "d")
    val listed = g.sql("SHOW TABLES IN graft").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(listed === Set(("t", "session"), ("d", "durable")))
    val desc = g.sql("DESCRIBE TABLE t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(desc === Seq(("k", "bigint", "key"), ("custkey", "bigint", ""),
      ("status", "string", ""), ("totalprice", "double", "")))
    // DESCRIBE tracks evolution: ALTER TABLE ADD COLUMN shows up
    g.sql("ALTER TABLE d ADD COLUMN note string")
    assert(g.sql("DESCRIBE TABLE d").collect()
      .map(_.getString(0)).toSeq === Seq("k", "v", "note"))
    // only the EXPLICIT graft namespace / single-part registered names
    // intercept — qualified forms pass through to spark.sql
    intercept[Exception](
      g.sql("SHOW TABLES IN spark_catalog.nosuchdb").collect())
    intercept[Exception](
      g.sql("DESCRIBE TABLE spark_catalog.nosuchdb.t").collect())
  }

  test("ALTER TABLE RENAME TO: the whole identity moves — history and index included") {
    val (g, cat) = durableFixture()
    cat.createIndex("t", "custkey") // physical layout op — before history
    g.sql("UPDATE t SET status = 'U' WHERE k = 1") // some history
    g.sql("ALTER TABLE t RENAME TO t2")
    // the new name serves reads, the version history and the index
    assert(g.sql("SELECT status FROM t2 WHERE k = 1").head().getString(0) === "U")
    assert(cat.getTable("t2").asOfRelative(-1).where($"k" === 1L)
      .head().getAs[String]("status") === "A")
    assert(cat.indexOf("t2") === Some("custkey"))
    // the old name is gone everywhere (engine, catalog dir, view)
    assert(!cat.tableNames.contains("t"))
    intercept[Exception](g.sql("INSERT INTO t VALUES (9, 9, 'Z', 9.0)"))
    // target collisions refuse loud
    val wh2 = Files.createTempDirectory("graft_sql_ren2_").toString
    val cat2 = new Catalog(spark, wh2, autoCompact = false)
    cat2.createTable("u", "k", Seq((1L, 1L, "A", 1.0))
      .toDF("k", "custkey", "status", "totalprice"))
    g.register("u", cat2, "u")
    intercept[IllegalArgumentException](g.sql("ALTER TABLE u RENAME TO t2"))
    // in-session rename is a map move
    val gs = fixture()
    gs.sql("ALTER TABLE t RENAME TO s2")
    assert(gs.sql("SELECT COUNT(*) AS n FROM s2").head().getLong(0) === 3L)
  }

  private def starFixture(): (GraftSql, Catalog) = {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_sql_jmv_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("f", "k",
      Seq((1L, 10L, 5.00), (2L, 10L, 2.50), (3L, 20L, 4.00))
        .toDF("k", "rid", "amount"))
    cat.createTable("d", "r",
      Seq((10L, "east"), (20L, "west")).toDF("r", "region"))
    (new GraftSql(spark).register("f", cat, "f").register("d", cat, "d"),
      cat)
  }

  private def planFiles(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  test("a star-join aggregate routes to the CURRENT join view; staleness on either side falls back") {
    import org.apache.spark.sql.functions.{col, lit}
    val (g, cat) = starFixture()
    cat.createJoinMaterializedView("jv", "f", "d", "rid",
      Seq("region"), Seq("amount"))
    g.register("jv", cat, "jv")
    val q = """SELECT region, count(*) AS n, sum(amount) AS s
              |FROM f JOIN d ON rid = r GROUP BY region""".stripMargin
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val routed = g.sql(q)
    assert(planFiles(routed).contains("/jv"),
      "expected the star aggregate to read the JOIN VIEW's files")
    assert(rowsOf(routed) === Set(("east", 2L, 7.5), ("west", 1L, 4.0)))
    // reversed sides and qualified equality route identically
    val flipped = g.sql("""SELECT region, count(*) AS n, sum(amount) AS s
                          |FROM d JOIN f ON d.r = f.rid
                          |GROUP BY region""".stripMargin)
    assert(planFiles(flipped).contains("/jv"))
    assert(rowsOf(flipped) === rowsOf(routed))
    // FACT committed, view not refreshed → direct path with fresh rows
    g.sql("UPDATE f SET amount = amount + 1.0 WHERE k = 3")
    val direct = g.sql(q)
    assert(!planFiles(direct).contains("/jv"),
      "a fact-stale join view must never serve")
    assert(rowsOf(direct) === Set(("east", 2L, 7.5), ("west", 1L, 5.0)))
    g.sql("CALL graft.refresh_mview('jv')")
    assert(planFiles(g.sql(q)).contains("/jv"))
    // DIM committed → dim-stale view must not serve either
    cat.commit("d", graft.core.Txn.empty
      .update(col("r") === 10L, Map("region" -> lit("ne"))))
    assert(!planFiles(g.sql(q)).contains("/jv"),
      "a dim-stale join view must never serve")
    g.sql("CALL graft.refresh_mview('jv')")
    val rerouted = g.sql(q)
    assert(planFiles(rerouted).contains("/jv"))
    assert(rowsOf(rerouted) === Set(("ne", 2L, 7.5), ("west", 1L, 5.0)))
    // an unmaintained aggregate over the join passes through untouched
    assert(!planFiles(g.sql(
      """SELECT region, min(amount) AS m FROM f JOIN d ON rid = r
        |GROUP BY region""".stripMargin)).contains("/jv"))
  }

  test("HAVING / ORDER BY / LIMIT compose over the routed star join") {
    val (g, cat) = starFixture()
    cat.createJoinMaterializedView("jv", "f", "d", "rid",
      Seq("region"), Seq("amount"))
    g.register("jv", cat, "jv")
    val topn = g.sql("""SELECT region, count(*) AS n, sum(amount) AS s
                       |FROM f JOIN d ON rid = r GROUP BY region
                       |HAVING sum(amount) > 1.0
                       |ORDER BY s DESC LIMIT 1""".stripMargin)
    assert(planFiles(topn).contains("/jv"),
      "the full dashboard top-n must route onto the join view")
    assert(topn.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq(("east", 2L, 7.5)))
  }

  test("CALL graft.create_join_mview completes the SQL-only star lifecycle") {
    val (g, _) = starFixture()
    g.sql("CALL graft.create_join_mview('jv2', 'f', 'd', 'rid', " +
      "'region', 'amount')")
    val routed = g.sql("""SELECT region, count(*) AS n, sum(amount) AS s
                         |FROM f JOIN d ON rid = r
                         |GROUP BY region""".stripMargin)
    assert(planFiles(routed).contains("/jv2"))
    assert(routed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set(("east", 2L, 7.5), ("west", 1L, 4.0)))
  }

  test("durable views: text semantics, stacking, fresh-session read, guards") {
    val wh = Files.createTempDirectory("graft_sql_view_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val g = new GraftSql(spark).attach(cat)
    g.sql("CREATE TABLE vt (k BIGINT, grp STRING, v BIGINT) USING graft " +
      "OPTIONS ('key' = 'k')")
    g.sql("INSERT INTO vt VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)")
    g.sql("CREATE VIEW v_a AS SELECT k, grp, v FROM vt WHERE grp = 'a'")
    g.sql("CREATE VIEW v_sum AS SELECT grp, CAST(sum(v) AS BIGINT) AS sv " +
      "FROM v_a GROUP BY grp")
    // a view is TEXT: DML issued after creation is visible through it
    g.sql("INSERT INTO vt VALUES (4, 'a', 40)")
    assert(g.sql("SELECT sv FROM v_sum").collect().map(_.getLong(0)).toSeq
      === Seq(80L))
    // stacking resolved recursively; the filter view sees 3 'a' rows
    assert(g.sql("SELECT count(*) AS n FROM v_a").collect()
      .head.getLong(0) === 3L)
    // fresh session over the same warehouse: zero re-declaration
    val g2 = new GraftSql(spark).attach(new Catalog(spark, wh,
      autoCompact = false))
    g2.register("vt", new Catalog(spark, wh, autoCompact = false), "vt")
    assert(g2.sql("SELECT sv FROM v_sum").collect().head.getLong(0) === 80L)
    // SHOW TABLES lists views in their own scope
    val shown = g.sql("SHOW TABLES IN graft").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(shown.contains(("v_a", "view")) && shown.contains(("v_sum", "view")))
    // guards: duplicate create is loud; OR REPLACE and IF NOT EXISTS land
    intercept[IllegalArgumentException](
      g.sql("CREATE VIEW v_a AS SELECT 1 AS one"))
    g.sql("CREATE VIEW IF NOT EXISTS v_a AS SELECT 1 AS one") // no-op kept
    assert(g.sql("SELECT count(*) AS n FROM v_a").collect()
      .head.getLong(0) === 3L)
    g.sql("CREATE OR REPLACE VIEW v_sum AS " +
      "SELECT grp, CAST(count(*) AS BIGINT) AS sv FROM v_a GROUP BY grp")
    assert(g2.sql("SELECT sv FROM v_sum").collect().head.getLong(0) === 3L)
    // a view name can't be shadowed by a table; a cycle fails loud
    intercept[IllegalArgumentException](cat.createTable("v_a", "k",
      Seq((1L, 1L)).toDF("k", "v")))
    cat.createView("cyc", "SELECT * FROM cyc2")
    cat.createView("cyc2", "SELECT * FROM cyc")
    intercept[IllegalArgumentException](g.sql("SELECT * FROM cyc"))
    // DROP VIEW removes durably; the name then resolves nowhere
    g.sql("DROP VIEW v_sum")
    assert(cat.viewSql("v_sum").isEmpty)
    intercept[Exception](g2.sql("SELECT sv FROM v_sum").collect())
  }

  test("a durable VIEW over a routable aggregate serves from the mview") {
    val (g0, cat) = durableFixture()
    val g = g0.attach(cat)
    cat.createMaterializedView("mv", "t", "status", "totalprice")
    g.register("mv", cat, "mv")
    cat.createView("v_dash",
      "SELECT status, count(*) AS n, sum(totalprice) AS s " +
      "FROM t GROUP BY status")
    val routed = g.sql("SELECT * FROM v_dash")
    routed.queryExecution.toRdd.count()
    assert(routed.queryExecution.executedPlan.toString.contains("/mv"),
      "the expanded view text must route onto the materialized view")
    assert(routed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set(("A", 1L, 100.0), ("B", 1L, 200.0), ("C", 1L, 300.0)))
    // staleness still falls back THROUGH the view
    g.sql("UPDATE t SET totalprice = totalprice + 1.0 WHERE k = 1")
    val direct = g.sql("SELECT * FROM v_dash")
    direct.queryExecution.toRdd.count()
    assert(!direct.queryExecution.executedPlan.toString.contains("/mv"))
    assert(direct.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set(("A", 1L, 101.0), ("B", 1L, 200.0), ("C", 1L, 300.0)))
  }

  test("UPDATE ... FROM joins the source and updates matched rows only " +
      "(r14): desugars onto the engine merge") {
    val g = fixture()
    Seq((10L, 5.0), (30L, 7.0)).toDF("ck", "bump")
      .createOrReplaceTempView("bumps")
    g.sql("UPDATE t SET totalprice = totalprice + b.bump " +
      "FROM bumps b WHERE t.custkey = b.ck")
    assert(rows(g) === Seq((1L, 10L, "A", 105.0), (2L, 20L, "B", 200.0),
      (3L, 30L, "C", 307.0)))
    // one _ver stamp for the whole statement
    assert(g.table("t").snapshot.count() === 3L)
    // alias-free spelling and a subquery source both work
    g.sql("UPDATE t SET status = concat(t.status, '+') " +
      "FROM (SELECT ck FROM bumps WHERE bump > 6.0) s WHERE t.custkey = s.ck")
    assert(rows(g).map(_._3) === Seq("A", "B", "C+"))
  }

  test("UPDATE ... FROM rejects a multi-match source loud (Delta " +
      "cardinality rule) and a keyed SET target") {
    val g = fixture()
    Seq((10L, 1.0), (10L, 2.0)).toDF("ck", "bump")
      .createOrReplaceTempView("dup_bumps")
    val e = intercept[Exception](g.sql(
      "UPDATE t SET totalprice = totalprice + d.bump " +
        "FROM dup_bumps d WHERE t.custkey = d.ck"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("matched more than one source row")),
      s"expected the cardinality rejection, got $e")
    // target untouched after the rejected statement
    assert(rows(g) === Seq((1L, 10L, "A", 100.0), (2L, 20L, "B", 200.0),
      (3L, 30L, "C", 300.0)))
    intercept[IllegalArgumentException](g.sql(
      "UPDATE t SET k = 99 FROM dup_bumps d WHERE t.custkey = d.ck"))
  }

  test("DELETE ... USING tombstones joined rows; multi-match collapses " +
      "(r14): the Postgres join-delete") {
    val g = fixture()
    // duplicate source rows for ck=10 — DELETE permits multi-match
    Seq((10L, "x"), (10L, "y"), (30L, "z")).toDF("ck", "why")
      .createOrReplaceTempView("kill_list")
    g.sql("DELETE FROM t USING kill_list d WHERE t.custkey = d.ck")
    assert(rows(g) === Seq((2L, 20L, "B", 200.0)))
    // one _ver stamp; the deleted states remain versioned history
    assert(g.table("t").asOfRelative(-1).count() === 3L)
  }

  test("UPDATE ... FROM inside BEGIN..COMMIT stashes like other DML " +
      "(r14): both-or-neither with the rest of the transaction") {
    val (g, _) = durableFixture()
    Seq((10L, 5.0)).toDF("ck", "bump").createOrReplaceTempView("txn_bumps")
    g.sql("BEGIN")
    g.sql("UPDATE t SET totalprice = totalprice + b.bump " +
      "FROM txn_bumps b WHERE t.custkey = b.ck")
    g.sql("DELETE FROM t WHERE k = 3")
    g.sql("COMMIT")
    assert(rows(g) === Seq((1L, 10L, "A", 105.0), (2L, 20L, "B", 200.0)))
    // and a ROLLBACK discards the join-update with everything else
    g.sql("BEGIN")
    g.sql("UPDATE t SET totalprice = totalprice + b.bump " +
      "FROM txn_bumps b WHERE t.custkey = b.ck")
    g.sql("ROLLBACK")
    assert(rows(g) === Seq((1L, 10L, "A", 105.0), (2L, 20L, "B", 200.0)))
  }

  test("TIMESTAMP literals route like bare strings in a NON-UTC session " +
      "(r14 ADVICE): both are UTC wall-clock instants") {
    // the parser reads TIMESTAMP '...' in the SESSION timezone while the
    // bare-string path (wallClockMillis) always meant UTC — pre-r14 the
    // two spellings routed to DIFFERENT day slices in any non-UTC
    // session. Pin equality under America/Los_Angeles (UTC-8).
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val wh = Files.createTempDirectory("graft_tzroute_").toString
      val cat = new Catalog(spark, wh, autoCompact = false)
      val day0 = 1704067200L * 1000000000L // 2024-01-01T00:00Z in nanos
      val df = (0 until 48).map { h =>
        (h.toLong, day0 + h.toLong * 3600L * 1000000000L, h.toLong)
      }.toDF("k", "ts", "v")
      cat.createTable("tzev", "k", df,
        partitionBy = Seq("ts"), partitionFuncs = Seq("days"))
      val g = new GraftSql(spark).register("tzev", cat, "tzev")
      def ks(sql: String): Seq[Long] =
        g.sql(sql).collect().map(_.getLong(0)).sorted.toSeq
      val viaTs = ks(
        "SELECT k FROM tzev WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' " +
          "AND ts < TIMESTAMP '2024-01-03 00:00:00'")
      val viaStr = ks(
        "SELECT k FROM tzev WHERE ts >= '2024-01-02 00:00:00' " +
          "AND ts < '2024-01-03 00:00:00'")
      assert(viaTs === viaStr, "TIMESTAMP vs bare-string routing diverged")
      // and both mean the UTC day boundary: hours 24..47
      assert(viaTs === (24L until 48L).toSeq)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns (r14): " +
      "pre-evolve rows read NULL; session tables reject loud") {
    val wh = Files.createTempDirectory("graft_mev_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val g = new GraftSql(spark).register("t", cat, "t")
    Seq((2L, "B", 7L), (3L, "c", 9L)).toDF("k", "v", "extra")
      .createOrReplaceTempView("mev_spec_src")
    g.sql("""MERGE WITH SCHEMA EVOLUTION INTO t USING mev_spec_src s
            |ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = cat.getTable("t").snapshot.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got === Seq((1L, "a", -1L), (2L, "B", 7L), (3L, "c", 9L)))
    // idempotent re-merge: the column already exists, nothing re-adds
    g.sql("""MERGE WITH SCHEMA EVOLUTION INTO t USING mev_spec_src s
            |ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(cat.getTable("t").snapshot.columns.count(_ == "extra") === 1)
    // in-session tables have no catalog metadata to evolve — loud
    val gs = fixture()
    val ex = intercept[IllegalArgumentException] {
      gs.sql("""MERGE WITH SCHEMA EVOLUTION INTO t USING mev_spec_src s
               |ON t.k = s.k
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(ex.getMessage.contains("in-session"))
  }

  test("ASOF JOIN desugars to latest-at-or-before / earliest-at-or-after " +
      "(r14); INNER semantics; two inequalities reject loud") {
    val g = new GraftSql(spark)
    Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 15L, 150.0))
      .toDF("k", "t", "v").createOrReplaceTempView("asof_r")
    Seq((1L, 18L), (1L, 5L), (2L, 99L)).toDF("k", "t")
      .createOrReplaceTempView("asof_l")
    val back = g.sql("""SELECT l.k, l.t, r.t AS rt, r.v
                       |FROM asof_l l ASOF JOIN asof_r r
                       |  ON l.k = r.k AND l.t >= r.t""".stripMargin)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).toSet
    // (1,5) has nothing at-or-before — INNER semantics drop it
    assert(back === Set((1L, 18L, 10L, 100.0), (2L, 99L, 15L, 150.0)))
    val fwd = g.sql("""SELECT l.k, l.t, r.t AS rt
                      |FROM asof_l l ASOF JOIN asof_r r
                      |  ON l.k = r.k AND l.t <= r.t""".stripMargin)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(fwd === Set((1L, 18L, 20L), (1L, 5L, 10L)))
    val ex = intercept[IllegalArgumentException] {
      g.sql("SELECT * FROM asof_l l ASOF JOIN asof_r r " +
        "ON l.k = r.k AND l.t >= r.t AND l.t < r.t")
    }
    assert(ex.getMessage.contains("ONE inequality"))
    // a column alias literally named `asof` must pass through untouched
    // — the r14 full sweep caught the probe swallowing sql_asof's
    // time-travel statement over exactly this
    val alias = g.sql("SELECT 'x' AS asof, k FROM asof_l WHERE k = 2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(alias === Seq(("x", 2L)))
  }

  test("QUALIFY filters on a select-list window alias (r14): top-1 per " +
      "group, trailing ORDER BY/LIMIT run after the filter") {
    val g = new GraftSql(spark)
    Seq((1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0),
        (4L, "b", 5.0), (5L, "b", 7.0))
      .toDF("id", "grp", "v").createOrReplaceTempView("qlf_t")
    val top1 = g.sql(
      """SELECT grp, id, v,
        |  CAST(row_number() OVER (PARTITION BY grp
        |    ORDER BY v DESC, id) AS BIGINT) AS rn
        |FROM qlf_t QUALIFY rn = 1 ORDER BY grp""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top1 === Seq(("a", 2L), ("b", 5L)))
    // predicate may also be a bare window expression (no alias) — and a
    // top-level LIMIT applies after the filter
    val lim = g.sql(
      """SELECT grp, id FROM qlf_t
        |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC, id) <= 2
        |ORDER BY grp, id LIMIT 3""".stripMargin)
      .collect().map(_.getLong(1)).toSeq
    assert(lim === Seq(2L, 3L, 4L))
  }

  test("QUALIFY: subquery clauses never split the outer statement; " +
      "DISTINCT rejects loud") {
    val g = new GraftSql(spark)
    Seq((1L, "a", 10.0), (2L, "a", 30.0), (3L, "b", 20.0))
      .toDF("id", "grp", "v").createOrReplaceTempView("qlf_s")
    // the inner derived table has its own ORDER/LIMIT inside parens —
    // the top-level scan must find only the outer QUALIFY
    val r = g.sql(
      """SELECT grp, id,
        |  CAST(rank() OVER (PARTITION BY grp ORDER BY v DESC) AS BIGINT) AS rk
        |FROM (SELECT * FROM qlf_s ORDER BY id LIMIT 3) s
        |QUALIFY rk = 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(r === Seq(("a", 2L), ("b", 3L)))
    val ex = intercept[IllegalArgumentException] {
      g.sql("SELECT DISTINCT grp FROM qlf_s QUALIFY " +
        "row_number() OVER (ORDER BY grp) = 1")
    }
    assert(ex.getMessage.contains("DISTINCT"))
  }
}
