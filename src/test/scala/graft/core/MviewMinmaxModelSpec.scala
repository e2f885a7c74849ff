package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Randomized model check for the min/max materialized-view algebra
 * (r10): after EVERY commit+refresh of a seeded random op sequence —
 * inserts into new and existing groups, value updates that raise/lower
 * extrema in place, group migrations, deletions of extrema and of
 * whole groups, plus occasional compactions (epoch bump → the full-
 * recompute path) — the view must equal a declarative recompute of the
 * live snapshot BIT FOR BIT. This is the LineageModelSpec discipline
 * applied to the trickiest new refresh algebra: the combine/rescan
 * split can only survive if no sequence of ops can make a stale
 * extremum stick.
 */
class MviewMinmaxModelSpec extends SparkSpec {

  import spark.implicits._

  private type St = Set[(String, Long, Long, Option[Long], Option[Long])]

  private def viewState(cat: Catalog): St =
    cat.getTable("v").snapshot
      .select(col("g"), col("n_rows"), col("cents"),
        col("minc_m"), col("maxc_m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

  private def recompute(cat: Catalog): St =
    cat.getTable("t").snapshot
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(graft.functions.Exact.cents(col("m"))), lit(0L)).as("c"),
        min(graft.functions.Exact.cents(col("m"))).as("mn"),
        max(graft.functions.Exact.cents(col("m"))).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

  test("30 random steps: every refresh equals a declarative recompute") {
    val wh = Files.createTempDirectory("graft_mvmm_model_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val rnd = new scala.util.Random(42)
    val groups = Vector("a", "b", "c", "d")
    // live model state: key -> (group, 2dp value)
    var model = (1L to 12L).map(k =>
      k -> (groups(rnd.nextInt(4)), (rnd.nextInt(10000) + 1) / 100.0)).toMap
    var nextKey = 13L
    cat.createTable("t", "k",
      model.toSeq.map { case (k, (g, m)) => (k, g, m) }.toDF("k", "g", "m"))
    cat.createMaterializedView("v", "t", Seq("g"), Seq("m"),
      minCols = Seq("m"), maxCols = Seq("m"))
    assert(viewState(cat) === recompute(cat), "initial build diverged")

    for (step <- 1 to 30) {
      val op = rnd.nextInt(10)
      val txn: Option[Txn] = op match {
        case 0 | 1 => // insert a fresh key (sometimes a brand-new group)
          val g = if (rnd.nextInt(5) == 0) s"new$step"
                  else groups(rnd.nextInt(4))
          val m = (rnd.nextInt(10000) + 1) / 100.0
          model += nextKey -> (g, m); nextKey += 1
          Some(Txn.empty.insert(
            Seq((nextKey - 1, g, m)).toDF("k", "g", "m")))
        case 2 | 3 => // re-value an existing key (can move an extremum)
          val k = model.keys.toSeq(rnd.nextInt(model.size))
          val m = (rnd.nextInt(10000) + 1) / 100.0
          model += k -> (model(k)._1, m)
          Some(Txn.empty.update(col("k") === k, Map("m" -> lit(m))))
        case 4 => // migrate a key across groups (minus + plus sides)
          val k = model.keys.toSeq(rnd.nextInt(model.size))
          val g = groups(rnd.nextInt(4))
          model += k -> (g, model(k)._2)
          Some(Txn.empty.update(col("k") === k, Map("g" -> lit(g))))
        case 5 | 6 => // delete a key — sometimes the group's extremum
          val k = model.keys.toSeq(rnd.nextInt(model.size))
          model -= k
          Some(Txn.empty.delete(col("k") === k))
        case 7 => // delete a whole group's rows (group leaves the view)
          val g = model.values.map(_._1).toSeq(rnd.nextInt(model.size))
          model = model.filter(_._2._1 != g)
          Some(Txn.empty.delete(col("g") === g))
        case 8 => // targeted extremum kill: delete the global max row
          val (k, _) = model.maxBy { case (k, (_, m)) => (m, -k) }
          model -= k
          Some(Txn.empty.delete(col("k") === k))
        case _ => // physical rewrite: epoch bump, full-recompute path
          cat.foldTail("t"); None
      }
      txn.foreach(t => cat.commit("t", t))
      cat.refreshMaterializedView("v")
      val got = viewState(cat)
      val want = recompute(cat)
      assert(got === want,
        s"step $step (op $op): view diverged\n got: $got\nwant: $want")
      // the model agrees with the table itself (sanity on the fixture)
      assert(cat.getTable("t").snapshot.count() === model.size.toLong)
    }
  }
}
