package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV sketch aggregate ≡ the declarative k-smallest-distinct it avoids. */
class KMinValuesSpec extends SparkSpec {

  import spark.implicits._

  private def kmvOf(values: Seq[Long], k: Int): Seq[Long] =
    values.toDF("h").repartition(7) // force multi-partition partial+merge
      .agg(KMinValues.kMinValues(col("h"), k).as("kmv"))
      .head().getSeq[Long](0)

  test("equals distinct-sort-take(k) regardless of partitioning") {
    val vals = (1L to 500L).map(i => (i * 7919L) % 1000L) // dups included
    assert(kmvOf(vals, 16) === vals.distinct.sorted.take(16))
  }

  test("duplicates collapse — set semantics, the KMV estimator contract") {
    assert(kmvOf(Seq(5L, 5L, 5L, 1L, 1L, 9L), 4) === Seq(1L, 5L, 9L))
  }

  test("fewer than k distinct values returns them all, sorted") {
    assert(kmvOf(Seq(3L, 2L, 8L), 10) === Seq(2L, 3L, 8L))
  }

  test("nulls are ignored like every aggregate") {
    val out = Seq(Some(4L), None, Some(2L), None).toDF("h")
      .agg(KMinValues.kMinValues(col("h"), 8))
      .head().getSeq[Long](0)
    assert(out === Seq(2L, 4L))
  }

  test("the estimate lands within the ~1/sqrt(k) band on uniform hashes") {
    val n = 5000
    // md5-derived 60-bit hashes, as the query uses
    val df = spark.range(n).select(
      conv(substr(md5(col("id").cast("string")), lit(1), lit(15)), 16, 10)
        .cast("long").as("h"))
    val k = 256
    val kth = df.agg(KMinValues.kMinValues(col("h"), k).as("kmv"))
      .select(element_at(col("kmv"), k)).head().getLong(0)
    val est = (k - 1).toDouble * math.pow(2, 60) / kth.toDouble
    assert(math.abs(est - n) / n < 4.0 / math.sqrt(k), // 4 sigma
      s"estimate $est too far from $n")
  }
}
