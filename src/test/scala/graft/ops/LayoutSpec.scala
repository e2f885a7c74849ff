package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("bucketed join of two fact tables runs without any Exchange") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Layout.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Layout.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    // at test SF the planner would broadcast instead; force the merge join
    // a 100 TB fact-fact join would use, so bucketing is what's exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val n = joined.count()
      assert(n === lineitem.count()) // every lineitem row matches one order
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join equals the plain join and keys on (key, salt)") {
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    val dim = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = fact.join(dim, "l_suppkey")
    val salted = Layout.saltedJoin(fact, dim, "l_suppkey",
      saltBy = col("l_orderkey"), nSalts = 8)
    assert(salted.count() === plain.count())
    // same multiset of (orderkey, suppkey, name)
    val a = plain.groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // and the join key includes the salt (skew spread across partitions)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
  }
}
