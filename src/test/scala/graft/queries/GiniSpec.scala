package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The q_gini decomposition's algebra, pinned: Σ rank·v computed from
 * per-(range-partition, group) aggregates must be EXACT — identical
 * longs-then-doubles at any shuffle width — and must match the
 * closed-form Gini on a hand case. The DuckDB oracle checks one
 * layout; this spec is the partition-independence half.
 */
class GiniSpec extends SparkSpec {

  private def gini(sfDir: String): Seq[(String, Long, Double)] =
    graft.SparkEntry.queries("q_gini")(spark, sfDir)
      .orderBy("status")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq

  test("hand case: values 1..4 in one group give exactly G = 0.25") {
    // G = (2·Σ i·vᵢ − (n+1)·Σv) / (n·Σv) with v = 1,2,3,4 (cents 100..400):
    // (2·(100+400+900+1600)·100scale − 5·1000·100scale) / (4·1000·100scale)
    // = (6000 − 5000) / 4000 = 0.25 — scale cancels, exact in doubles
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_gini_").toString
    Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0), (4L, "A", 4.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.parquet(s"$wh/orders.parquet")
    val r = graft.SparkEntry.queries("q_gini")(spark, wh).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 4L)
    assert(r(0).getDouble(2) === 0.25)
  }

  test("partition-independent: shuffle width 3 vs 7 vs 32 are bit-identical") {
    // the decomposition sums exact integers, so the DOUBLES must agree
    // to the last bit across widths — any drift means the algebra leaks
    val base = gini(sfDir)
    assert(base.nonEmpty)
    for (w <- Seq("3", "7")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", w)
      try assert(gini(sfDir) === base, s"drift at width $w")
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
