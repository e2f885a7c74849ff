package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and isolated wall time of
  * one query. Usage: runMain graft.Explain <name> [sfDir] [explain|time|both] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides: SPARK_GRAFT_CONF="k1=v1;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (mode != "time") println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    if (mode != "explain") {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      // fresh DataFrame for the steady run — same protocol as Bench (no
      // stage/plan reuse; cache hits only via CacheManager plan matching)
      val df2 = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df2.queryExecution.toRdd.count()
      println(f"[explain] $name: second run ${(System.nanoTime() - t1) / 1e9}%.2fs")
      // post-execution plan: AQE has finalized stages, so runtime reuse
      // (ReusedExchange/ReusedQueryStage) is visible here and not above
      val post = df2.queryExecution.executedPlan.toString
      println(s"[explain] reused-exchange nodes: " +
        "ReusedExchange|ReusedQueryStage|table cache".r.findAllIn(post).size)
    }
    spark.stop()
  }
}
