package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Layout.topNPerGroup: the parallel-exact per-group top-N (range
  * partition + local ranks + broadcast offsets) must equal the naive
  * single-reducer-per-group window exactly — ranks included. */
class TopNSpec extends SparkSpec {

  private def docs = Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("lang"),
      md5(col("doc_id").cast("string")).as("h"))

  test("equals the naive global window, ranks included") {
    val got = Layout.topNPerGroup(docs, Seq("lang"), Seq("h", "doc_id"), 7)
      .select(col("lang"), col("doc_id"), col("_rank"))
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val want = docs
      .withColumn("_rank", row_number().over(w).cast("long"))
      .where(col("_rank") <= 7)
      .select(col("lang"), col("doc_id"), col("_rank"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("n larger than any group returns every row, exactly once") {
    val total = docs.count()
    val got = Layout.topNPerGroup(docs, Seq("lang"), Seq("h", "doc_id"),
      total.toInt + 10)
    assert(got.count() === total)
    assert(got.select(col("doc_id")).distinct().count() === total)
  }

  test("the ranking window is balanced: it partitions by (_pid, group)") {
    val df = Layout.topNPerGroup(docs, Seq("lang"), Seq("h", "doc_id"), 7)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the big window must run per (partition id, group) — a windowspec
    // mentioning only the group column would funnel each group onto one
    // reducer (the few-strata scale trap this helper exists to avoid)
    val winSpecs = "Window \\[[^\\]]*row_number[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.exists(_.contains("_pid")),
      s"expected the rank window keyed by _pid:\n$plan")
  }
}
