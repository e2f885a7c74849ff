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
  }
}
