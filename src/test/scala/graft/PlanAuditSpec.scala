package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Catalog

/**
 * Plan audits: the scale claims in SURVEY §3/§5 as assertions.
 * These inspect executed plans, not results — a regression here means a
 * query silently became a full scan / shuffle join and would fall over at
 * 100 TB even though small-SF results stay correct.
 */
class PlanAuditSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.count() // finalize AQE
    // AdaptiveSparkPlan.toString prints the final plan then repeats the
    // initial plan — audit only the final one.
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("catalog point lookup pushes the key predicate to every parquet scan") {
    val wh = Files.createTempDirectory("graft_audit_").toString
    val cat = new Catalog(spark, wh)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    cat.commit("t", graft.core.Txn.empty
      .update(col("k") % 2 === 0, Map("price" -> (col("price") + 1.0))))
    val q = cat.getTable("t").snapshot.where(col("k") === 42L)
    val plan = executedPlan(q)
    // base scan AND tail scan must both receive the pushed key filter —
    // this is the distributed Index.locate: rowgroup stats skip everything
    // but the matching key range.
    val pushed = "PushedFilters: \\[[^\\]]*EqualTo\\(k,42\\)".r
      .findAllIn(plan).size
    assert(pushed == 2, s"expected key pushdown into base+tail scans:\n$plan")
  }

  test("q3/q5 join dimensions by broadcast, not shuffle") {
    val p3 = executedPlan(SparkEntry.queries("q3_join_topn")(spark, sfDir))
    assert(p3.contains("BroadcastHashJoin"), p3)
    val p5 = executedPlan(SparkEntry.queries("q5_join_multi")(spark, sfDir))
    assert(p5.contains("BroadcastHashJoin"), p5)
    assert(!p5.contains("CartesianProduct"), p5)
  }

  test("q1_agg scan is column-pruned to the referenced columns only") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    df.queryExecution.toRdd.count()
    // toString truncates FileScan details; formatted mode keeps them
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).get.group(1)
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"), s"scan reads: $cols")
    // and the shipdate filter reaches the scan
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
  }

  test("snapshot window induces exactly one shuffle on the table key") {
    val wh = Files.createTempDirectory("graft_audit2_").toString
    val cat = new Catalog(spark, wh)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    val plan = executedPlan(cat.getTable("t").snapshot)
    val shuffles = "Exchange hashpartitioning\\(k#".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 key shuffle, plan:\n$plan")
  }

  test("dedup/minhash pipelines contain no cartesian products") {
    Seq("dedup_ngram_jaccard", "dedup_minhash", "dedup_exact").foreach { q =>
      val plan = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }
}
