package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q_stats_agg computes corr/covar/stddev from exact integer power sums
  * (deterministic, partition-order-free). Spark's built-in estimators
  * stream double central moments — numerically different path, same
  * statistic — so agreement to tight relative error pins the algebra. */
class StatsAggSpec extends SparkSpec {

  test("exact power-sum statistics agree with Spark's built-in estimators") {
    val got = OlapQueries.queries("q_stats_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val ref = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           avg(col("l_quantity")).as("avg_qty"),
           stddev_samp(col("l_quantity")).as("std_qty"),
           covar_samp(col("l_quantity"), col("l_discount")).as("covar_qd"),
           corr(col("l_quantity"), col("l_discount")).as("corr_qd"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === ref.keySet)
    def rel(a: Double, b: Double): Double =
      math.abs(a - b) / math.max(1e-12, math.max(math.abs(a), math.abs(b)))
    got.keySet.foreach { g =>
      assert(got(g).getLong(1) === ref(g).getLong(1), s"$g: n")
      Seq(("avg_qty", 2), ("std_qty", 3), ("covar_qd", 4), ("corr_qd", 5))
        .foreach { case (cname, i) =>
          val (a, b) = (got(g).getDouble(i), ref(g).getDouble(i))
          assert(rel(a, b) < 1e-9, s"$g.$cname: exact=$a builtin=$b")
        }
    }
  }

  test("the statistics are bit-identical under a different partitioning") {
    // associativity proof: the same query under a different shuffle width
    // must emit bit-identical doubles — the property float-moment
    // accumulation lacks (merge order varies) and exact long sums restore
    val a = OlapQueries.queries("q_stats_agg")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "3")
    val b = OlapQueries.queries("q_stats_agg")(s2, sfDir)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
