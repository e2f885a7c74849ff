package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Incrementally-maintained materialized views (Catalog
  * .createMaterializedView / refreshMaterializedView): the differential
  * refresh must land bit-identical to a full recompute under every op
  * shape — inserts into new groups, group-migrating updates, deletions
  * emptying a group — and must be crash-idempotent and delta-proportional. */
class MviewSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(autoCompact: Boolean = false): Catalog =
    new Catalog(spark,
      Files.createTempDirectory("graft_mv_spec_").toString,
      autoCompact = autoCompact)

  private def base =
    Seq((1L, "a", 10.50), (2L, "a", 1.25), (3L, "b", 4.00), (4L, "c", 7.75))
      .toDF("k", "g", "price")

  /** The view's state as (group, n, cents) triples. */
  private def viewState(cat: Catalog, v: String): Set[(String, Long, Long)] =
    cat.getTable(v).snapshot
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  /** What a full recompute over the source's live snapshot says. */
  private def recomputed(cat: Catalog, src: String): Set[(String, Long, Long)] =
    cat.getTable(src).snapshot
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          graft.functions.Exact.cents(col("price"))).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("create computes the initial rollup; refresh on a current view is a no-op") {
    val cat = fresh()
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    assert(viewState(cat, "v") ===
      Set(("a", 2L, 1175L), ("b", 1L, 400L), ("c", 1L, 775L)))
    val before = cat.getTable("v").opSeq
    cat.refreshMaterializedView("v")
    assert(cat.getTable("v").opSeq === before, "no-op refresh must not commit")
  }

  test("insert/update/delete refresh differentially: equals full recompute") {
    val cat = fresh()
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    // new group (insert), group migration (a→b), group emptied (c deleted)
    cat.commit("t", Txn.empty
      .insert(Seq((9L, "d", 2.00)).toDF("k", "g", "price"))
      .update(col("k") === 1L, Map("g" -> lit("b")))
      .delete(col("k") === 4L))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === recomputed(cat, "t"))
    assert(viewState(cat, "v") ===
      Set(("a", 1L, 125L), ("b", 2L, 1450L), ("d", 1L, 200L)),
      "group c must be DELETED from the view, not left at zero")
  }

  test("refresh work is delta-proportional: touched groups only are appended") {
    val cat = fresh()
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    cat.commit("t", Txn.empty
      .update(col("k") === 3L, Map("price" -> (col("price") + lit(1.0)))))
    cat.refreshMaterializedView("v")
    val vt = cat.getTable("v")
    val appended = vt.lineage.where(col("_ver") === vt.opSeq).count()
    assert(appended === 1L, "one changed key in group b must append ONE view row")
    // a value-idempotent change nets zero everywhere: nothing to commit
    cat.commit("t", Txn.empty.update(col("k") === 2L, Map("g" -> col("g"))))
    cat.refreshMaterializedView("v")
    val vt2 = cat.getTable("v")
    assert(vt2.lineage.where(col("_ver") === vt2.opSeq).count() === 0L,
      "net-zero adjustments must not touch any group")
  }

  test("a re-run refresh against the recorded mv_seq never double-applies") {
    val cat = fresh()
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    cat.commit("t", Txn.empty
      .update(col("k") === 1L, Map("price" -> (col("price") + lit(5.0)))))
    cat.refreshMaterializedView("v")
    val once = viewState(cat, "v")
    // the refresh recorded the source op_seq atomically with its commit,
    // so a second call re-derives an EMPTY delta
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === once)
  }

  test("randomized op sequence: view tracks full recompute refresh by refresh") {
    val cat = fresh()
    val rnd = new scala.util.Random(42)
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    var nextKey = 100L
    val groups = Seq("a", "b", "c", "d", "e")
    (1 to 8).foreach { _ =>
      val txn = (1 to (1 + rnd.nextInt(3))).foldLeft(Txn.empty) { (tx, _) =>
        rnd.nextInt(3) match {
          case 0 =>
            nextKey += 1
            tx.insert(Seq((nextKey, groups(rnd.nextInt(groups.size)),
              rnd.nextInt(1000) / 100.0)).toDF("k", "g", "price"))
          case 1 =>
            tx.update(col("k") % (2 + rnd.nextInt(5)) === 0,
              Map("g" -> lit(groups(rnd.nextInt(groups.size))),
                  "price" -> (col("price") + lit(0.25))))
          case _ =>
            tx.delete(col("k") % (3 + rnd.nextInt(7)) === 1)
        }
      }
      cat.commit("t", txn)
      cat.refreshMaterializedView("v")
      assert(viewState(cat, "v") === recomputed(cat, "t"))
    }
  }

  test("randomized ops WITH physical maintenance: every epoch bump re-syncs") {
    // the adversarial variant: fold/vacuum/purge/saveCompacted interleave
    // with commits and refreshes — each re-stamps history and bumps the
    // epoch, so refreshes alternate unpredictably between the
    // differential and full-recompute paths; purge must pull erased keys
    // OUT of the rollup, vacuum/fold must not move it at all
    val cat = fresh()
    val rnd = new scala.util.Random(1337)
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    var nextKey = 500L
    val groups = Seq("a", "b", "c", "d")
    (1 to 10).foreach { i =>
      rnd.nextInt(6) match {
        case 0 | 1 =>
          nextKey += 1
          cat.commit("t", Txn.empty
            .insert(Seq((nextKey, groups(rnd.nextInt(groups.size)),
              rnd.nextInt(500) / 100.0)).toDF("k", "g", "price"))
            .update(col("k") % (2 + rnd.nextInt(4)) === 0,
              Map("price" -> (col("price") + lit(0.50)))))
        case 2 =>
          cat.commit("t", Txn.empty.delete(col("k") % (5 + rnd.nextInt(5)) === 2))
        case 3 => cat.foldTail("t")
        case 4 => cat.vacuum("t", 1 + rnd.nextInt(2))
        case _ =>
          cat.purge("t", col("k") % 11 === i.toLong)
      }
      cat.refreshMaterializedView("v")
      assert(viewState(cat, "v") === recomputed(cat, "t"),
        s"view diverged after step $i")
    }
  }

  test("physical rewrite of the source → full-recompute fallback, still exact") {
    val cat = fresh()
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    cat.commit("t", Txn.empty.delete(col("k") === 2L))
    // collapse history past the view's mv_seq: the old state at mv_seq is
    // no longer addressable, so the refresh must detect it and recompute
    cat.saveCompacted("t", cat.getTable("t").compact)
    cat.commit("t", Txn.empty.insert(Seq((9L, "e", 1.00)).toDF("k", "g", "price")))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === recomputed(cat, "t"))
    assert(viewState(cat, "v") ===
      Set(("a", 1L, 1050L), ("b", 1L, 400L), ("c", 1L, 775L), ("e", 1L, 100L)))
  }

  test("the view survives a catalog reopen (definition in metadata)") {
    val wh = Files.createTempDirectory("graft_mv_reopen_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    cat.commit("t", Txn.empty.delete(col("k") === 3L))
    val cat2 = new Catalog(spark, wh, autoCompact = false)
    cat2.refreshMaterializedView("v")
    assert(viewState(cat2, "v") === recomputed(cat2, "t"))
  }

  test("all-NULL sum groups: create, incremental and recompute all agree on 0") {
    val cat = fresh()
    cat.createTable("t", "k",
      Seq((1L, "a", Option.empty[Double]), (2L, "a", None), (3L, "b", Some(4.0)))
        .toDF("k", "g", "price"))
    cat.createMaterializedView("v", "t", "g", "price")
    assert(viewState(cat, "v") === Set(("a", 2L, 0L), ("b", 1L, 400L)))
    // a change inside the all-null group refreshes differentially and
    // must not drift from what a recompute would build
    cat.commit("t", Txn.empty.insert(
      Seq((9L, "a", Option.empty[Double])).toDF("k", "g", "price")))
    cat.refreshMaterializedView("v")
    assert(viewState(cat, "v") === Set(("a", 3L, 0L), ("b", 1L, 400L)))
  }

  test("streaming maintenance: the view advances per micro-batch commit") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
    val srcDir = Files.createTempDirectory("graft_mv_stream_").toString
    Seq(Seq((1L, "a", 99.00), (9L, "d", 2.00)),   // update + insert
        Seq((4L, "b", 7.75)))                     // group migration c→b
      .foreach(rows => rows.toDF("k", "g", "price")
        .coalesce(1).write.mode("append").parquet(srcDir))
    val cat = fresh()
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", "g", "price")
    val schema = new StructType()
      .add("k", LongType).add("g", StringType).add("price", DoubleType)
    val changes = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    graft.streaming.StreamOps.mergeStream(spark, changes, cat, "t",
      Seq("g", "price"), refreshView = Some("v"))
    // one merge commit + one refresh commit per batch on their tables
    assert(cat.getTable("t").opSeq >= 2L)
    assert(viewState(cat, "v") === recomputed(cat, "t"))
  }

  test("a plain table refuses to refresh; bad definitions are rejected") {
    val cat = fresh()
    cat.createTable("t", "k", base)
    val e = intercept[IllegalArgumentException](cat.refreshMaterializedView("t"))
    assert(e.getMessage.contains("not a materialized view"))
    intercept[IllegalArgumentException](
      cat.createMaterializedView("v2", "t", "g", "g"))
    intercept[IllegalArgumentException](
      cat.createMaterializedView("v3", "t", "nope", "price"))
    intercept[IllegalArgumentException](
      cat.createMaterializedView("v4", "t", Seq("g", "g"), Seq("price")))
    intercept[IllegalArgumentException](
      cat.createMaterializedView("v5", "t", Nil, Seq("price")))
  }

  private def base2 =
    Seq((1L, "a", "x", 10.50, 1.00), (2L, "a", "y", 1.25, 2.00),
        (3L, "b", "x", 4.00, 3.00), (4L, "a", "x", 7.75, 4.00))
      .toDF("k", "g1", "g2", "p1", "p2")

  /** Composite-group two-measure state as (g1, g2, n, cents1, cents2). */
  private def viewState2(cat: Catalog, v: String) =
    cat.getTable(v).snapshot.select("g1", "g2", "n_rows", "cents_p1", "cents_p2")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def recomputed2(cat: Catalog, src: String) =
    cat.getTable(src).snapshot
      .groupBy("g1", "g2")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          graft.functions.Exact.cents(col("p1"))).as("c1"),
        org.apache.spark.sql.functions.sum(
          graft.functions.Exact.cents(col("p2"))).as("c2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("composite group + multiple measures: differential equals full recompute") {
    val cat = fresh()
    cat.createTable("t", "k", base2)
    cat.createMaterializedView("v", "t", Seq("g1", "g2"), Seq("p1", "p2"))
    assert(viewState2(cat, "v") === recomputed2(cat, "t"))
    assert(viewState2(cat, "v") === Set(
      ("a", "x", 2L, 1825L, 500L), ("a", "y", 1L, 125L, 200L),
      ("b", "x", 1L, 400L, 300L)))
    // every op shape at once: insert into a NEW composite group, a
    // migration that changes ONE of the two group columns, and a delete
    // emptying a group
    cat.commit("t", Txn.empty
      .insert(Seq((9L, "c", "z", 2.00, 0.50)).toDF("k", "g1", "g2", "p1", "p2"))
      .update(col("k") === 1L, Map("g2" -> lit("y")))
      .delete(col("k") === 3L))
    cat.refreshMaterializedView("v")
    assert(viewState2(cat, "v") === recomputed2(cat, "t"))
    assert(viewState2(cat, "v") === Set(
      ("a", "x", 1L, 775L, 400L), ("a", "y", 2L, 1175L, 300L),
      ("c", "z", 1L, 200L, 50L)),
      "group (b,x) must be DELETED; (a,x)→(a,y) migration must move both measures")
    // a second differential round over the migrated state
    cat.commit("t", Txn.empty
      .update(col("k") === 9L, Map("p1" -> lit(3.00))))
    cat.refreshMaterializedView("v")
    assert(viewState2(cat, "v") === recomputed2(cat, "t"))
  }

  test("group values containing the composite-key characters cannot collide") {
    // length-prefixed encoding: ("a:1", "b") and ("a", "1:b") — a naive
    // separator join would merge these into one group
    val cat = fresh()
    cat.createTable("t", "k",
      Seq((1L, "a:1", "b", 1.00), (2L, "a", "1:b", 2.00),
          (3L, null.asInstanceOf[String], "Nb", 4.00),
          (4L, "N", "b", 8.00))
        .toDF("k", "g1", "g2", "p"))
    cat.createMaterializedView("v", "t", Seq("g1", "g2"), Seq("p"))
    assert(cat.getTable("v").snapshot.count() === 4L,
      "four distinct group tuples must stay four view rows")
    // and the null-group row refreshes differentially like any other
    cat.commit("t", Txn.empty.insert(
      Seq((9L, null.asInstanceOf[String], "Nb", 1.00)).toDF("k", "g1", "g2", "p")))
    cat.refreshMaterializedView("v")
    val nullRow = cat.getTable("v").snapshot
      .where(col("g1").isNull).select("n_rows", "cents")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nullRow === Set((2L, 500L)))
  }

  test("a LOST refresh (meta advanced, rows absent) is detected and repaired") {
    // build against a known dir so the spec can reach the tail files
    val dir = Files.createTempDirectory("graft_mv_lost_").toString
    val c = new Catalog(spark, dir, autoCompact = false)
    c.createTable("t", "k", base)
    c.createMaterializedView("v", "t", "g", "price")
    c.commit("t", Txn.empty.update(col("k") === 1L, Map("price" -> lit(99.00))))
    c.refreshMaterializedView("v")
    assert(viewState(c, "v") === recomputed(c, "t"))
    // simulate the crash window: the refresh's meta write survived, its
    // adjustment rows did not (meta-before-rows) — deleting the view's
    // tail reproduces exactly that durable state
    val tail = new java.io.File(s"$dir/v/tail")
    tail.listFiles().foreach(f => assert(f.delete() || !f.getName.endsWith(".parquet")))
    val cat2 = new Catalog(spark, dir, autoCompact = false)
    assert(viewState(cat2, "v") !== recomputed(cat2, "t"),
      "precondition: the view is diverged after the simulated crash")
    // the next refresh must DETECT the lost rows (mv_seq alone says
    // 'current') and fall back to a full recompute
    cat2.refreshMaterializedView("v")
    assert(viewState(cat2, "v") === recomputed(cat2, "t"),
      "refresh must repair a lost-refresh divergence, not no-op on mv_seq")
    // and the repair re-arms detection: another refresh is a clean no-op
    val before = cat2.getTable("v").opSeq
    cat2.refreshMaterializedView("v")
    assert(cat2.getTable("v").opSeq === before)
  }

  // ------------------------------------------------- min/max views (r10)

  /** The min/max view's state vs a declarative recompute — every refresh
    * path (combine, rescan, full) must agree with this bit-for-bit. */
  private def minmaxState(cat: Catalog, v: String): Set[Row4] =
    cat.getTable(v).snapshot
      .select(col("g"), col("n_rows"), col("minc_price"), col("maxc_price"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
  private type Row4 = (String, Long, Option[Long], Option[Long])
  private def minmaxRecompute(cat: Catalog, src: String): Set[Row4] =
    cat.getTable(src).snapshot
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.min(
          graft.functions.Exact.cents(col("price"))).as("mn"),
        org.apache.spark.sql.functions.max(
          graft.functions.Exact.cents(col("price"))).as("mx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("min/max views maintain incrementally; extremum deletion rescans that group only") {
    val cat = fresh()
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", Seq("g"), Nil,
      minCols = Seq("price"), maxCols = Seq("price"))
    assert(minmaxState(cat, "v") === minmaxRecompute(cat, "t"))
    // combine path: inserts extend extrema with least/greatest, no rescan
    cat.commit("t", Txn.empty.insert(
      Seq((10L, "a", 0.50), (11L, "b", 99.00), (12L, "d", 3.00))
        .toDF("k", "g", "price")))
    cat.refreshMaterializedView("v")
    assert(minmaxState(cat, "v") === minmaxRecompute(cat, "t"))
    // combine path: delete a NON-extremum row (a's 1.25 sits strictly
    // between 0.50 and 10.50)
    cat.commit("t", Txn.empty.delete(col("k") === 2L))
    cat.refreshMaterializedView("v")
    assert(minmaxState(cat, "v") === minmaxRecompute(cat, "t"))
    // rescan path: delete group a's MAXIMUM (10.50) — the recorded
    // extremum goes away and the group re-aggregates
    cat.commit("t", Txn.empty.delete(col("k") === 1L))
    cat.refreshMaterializedView("v")
    assert(minmaxState(cat, "v") === minmaxRecompute(cat, "t"))
    assert(minmaxState(cat, "v").exists(r =>
      r._1 == "a" && r._3 == Some(50L) && r._4 == Some(50L)),
      s"group a must have re-aggregated to its single 0.50 row: ${minmaxState(cat, "v")}")
    // rescan path: an UPDATE that lowers the recorded maximum in place
    cat.commit("t", Txn.empty.update(col("k") === 11L,
      Map("price" -> lit(1.00))))
    cat.refreshMaterializedView("v")
    assert(minmaxState(cat, "v") === minmaxRecompute(cat, "t"))
    // emptied group disappears from the view
    cat.commit("t", Txn.empty.delete(col("g") === "d"))
    cat.refreshMaterializedView("v")
    assert(minmaxState(cat, "v") === minmaxRecompute(cat, "t"))
    assert(!minmaxState(cat, "v").exists(_._1 == "d"))
    // group migration moves the extremum across groups
    cat.commit("t", Txn.empty.update(col("k") === 10L, Map("g" -> lit("c"))))
    cat.refreshMaterializedView("v")
    assert(minmaxState(cat, "v") === minmaxRecompute(cat, "t"))
    // min/max columns are load-bearing for evolution
    intercept[IllegalArgumentException](cat.dropColumn("t", "price"))
  }

  test("min/max views survive reopen and route through currentViewFor") {
    val wh = Files.createTempDirectory("graft_mv_spec_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k", base)
    cat.createMaterializedView("v", "t", Seq("g"), Seq("price"),
      minCols = Seq("price"), maxCols = Seq("price"))
    val hit = cat.currentViewFor("t", Seq("g"))
    assert(hit.isDefined)
    val (name, sums, centsOf, minOf, maxOf) = hit.get
    assert(name === "v" && sums === Seq("price"))
    assert(centsOf === Map("price" -> "cents"))
    assert(minOf === Map("price" -> "minc_price"))
    assert(maxOf === Map("price" -> "maxc_price"))
    // definition survives the meta round-trip: a reopened catalog still
    // maintains extrema (rescan after extremum delete)
    val cat2 = new Catalog(spark, wh, autoCompact = false)
    cat2.commit("t", Txn.empty.delete(col("k") === 1L)) // a's max
    cat2.refreshMaterializedView("v")
    assert(minmaxState(cat2, "v") === minmaxRecompute(cat2, "t"))
  }
}
