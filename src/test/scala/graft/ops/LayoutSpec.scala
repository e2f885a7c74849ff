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

  test("morton interleave places a-bits even, b-bits odd") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.morton(col("a"), col("b"), 4).as("z"))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z(0L -> 0L) == 0L)
    assert(z(1L -> 0L) == 1L)   // a bit 0 → z bit 0
    assert(z(0L -> 1L) == 2L)   // b bit 0 → z bit 1
    assert(z(1L -> 1L) == 3L)
    assert(z(3L -> 3L) == 15L)  // 0b11 ⨯ 0b11 → 0b1111
    assert(z(5L -> 2L) == 25L)  // a=0b101,b=0b010 → 0b011001
  }

  test("zorder re-layout preserves rows and prunes row groups on BOTH columns") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

    def writeAndProbe(layout: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zspec_").toString
      layout.write.mode("overwrite").parquet(dir)
      val t = spark.read.parquet(dir)
      // scan-output rows = rows surviving row-group min-max pruning: the
      // layout-dependent quantity (matching rows are layout-independent)
      def scanRows(probed: org.apache.spark.sql.DataFrame): Long = {
        probed.collect()
        probed.queryExecution.executedPlan.collectLeaves()
          .map(_.metrics("numOutputRows").value).sum
      }
      val byPrice = scanRows(t.where(col("o_totalprice").between(50000.0, 80000.0)))
      val byCust = scanRows(t.where(col("o_custkey") <= 20L))
      (byPrice, byCust)
    }

    val total = orders.count()
    val zordered = Layout.zorder(orders, "o_custkey", "o_totalprice",
      bits = 16, partitions = 16)
    // set-equality: re-layout changes nothing but physical order
    assert(zordered.count() == total)
    assert(zordered.exceptAll(orders).isEmpty && orders.exceptAll(zordered).isEmpty)

    val (zPrice, zCust) = writeAndProbe(zordered)
    val (sPrice, sCust) = writeAndProbe(
      orders.repartitionByRange(16, col("o_custkey"))
        .sortWithinPartitions(col("o_custkey")))
    // custkey-sorted layout prunes custkey probes but reads ~everything
    // for a price probe; Z-order prunes BOTH probes
    assert(sPrice > total / 2, s"price probe on custkey layout: $sPrice of $total")
    assert(zPrice < sPrice / 2, s"zorder price probe $zPrice !<< $sPrice")
    assert(zCust < total / 2, s"zorder custkey probe $zCust of $total")
  }

  test("3-column zorder prunes row groups on the THIRD column too (r10)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val total = orders.count()
    val z3 = Layout.zorder(orders,
      Seq("o_custkey", "o_totalprice", "o_orderkey"), 16, 16)
    // re-layout changes nothing but physical order
    assert(z3.count() == total)
    assert(z3.exceptAll(orders).isEmpty && orders.exceptAll(z3).isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_z3spec_").toString
    z3.write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    def scanRows(probed: org.apache.spark.sql.DataFrame): Long = {
      probed.collect()
      probed.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    // a range probe on EACH dimension individually row-group-prunes —
    // including the third (the 2-column layout cannot serve o_orderkey)
    val byKey = scanRows(t.where(col("o_orderkey") <= total / 20))
    val byCust = scanRows(t.where(col("o_custkey") <= 20L))
    val byPrice = scanRows(t.where(col("o_totalprice").between(50000.0, 80000.0)))
    assert(byKey < total / 2, s"zorder3 key probe $byKey of $total")
    // dilution is real and expected: 16 files = 4 z-prefix bits ≈ 1.3
    // bits per dimension, so a per-dimension probe prunes coarsely at
    // this scale — it must still skip a measurable share (more files =
    // more prefix bits = finer boxes at production scale)
    assert(byCust < total * 3 / 4, s"zorder3 custkey probe $byCust of $total")
    assert(byPrice < total * 3 / 4, s"zorder3 price probe $byPrice of $total")
    // 4-column x 16 bits overflows a long — rejected loud
    intercept[IllegalArgumentException](Layout.zorder(orders,
      Seq("o_custkey", "o_totalprice", "o_orderkey", "o_custkey"), 16, 16))
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
