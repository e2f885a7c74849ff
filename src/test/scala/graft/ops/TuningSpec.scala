package graft.ops

import graft.SparkSpec

class TuningSpec extends SparkSpec {

  test("small data returns the caller's session unchanged") {
    val s = Tuning.scaledSession(spark, sfDir, Seq("lineitem", "orders"))
    assert(s eq spark)
    // and the caller's session conf was never touched
    assert(spark.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum").isEmpty)
  }

  test("large data yields a conf-scoped clone; parent conf untouched") {
    // 1-byte partitions force the scale path on the tiny fixture
    val s = Tuning.scaledSession(spark, sfDir, Seq("lineitem"),
      bytesPerPartition = 1L, maxPartitions = 64)
    assert(s ne spark)
    assert(s.conf.get(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum") === "64")
    assert(spark.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum").isEmpty)
    // width caps at maxPartitions even though bytes/1 is far larger
    val bytes = Tuning.tableBytes(spark, sfDir, "lineitem")
    assert(bytes > 64)
  }

  test("clone is reused per width and reads the same data") {
    val a = Tuning.scaledSession(spark, sfDir, Seq("lineitem"),
      bytesPerPartition = 1L, maxPartitions = 64)
    val b = Tuning.scaledSession(spark, sfDir, Seq("lineitem"),
      bytesPerPartition = 1L, maxPartitions = 64)
    assert(a eq b)
    val viaClone = a.read.parquet(s"$sfDir/lineitem.parquet").count()
    val viaParent = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(viaClone === viaParent)
  }

  test("missing table counts zero bytes") {
    assert(Tuning.tableBytes(spark, sfDir, "no_such_table") === 0L)
  }
}
