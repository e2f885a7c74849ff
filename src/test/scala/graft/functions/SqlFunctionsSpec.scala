package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The injected SQL functions (plans/GraftExtensions.injectFunction)
  * resolve through spark.sql and agree exactly with the Column API —
  * the SQL front door reaches the same codegen'd expressions. */
class SqlFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("graft_dot via SQL equals the DotProduct column API") {
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 0.5f, -1.0f)),
        (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("graft_dot_test")
    val viaSql = spark.sql(
      "SELECT graft_dot(a, b) AS dot FROM graft_dot_test")
      .as[Double].collect().toSeq
    val viaCol = spark.table("graft_dot_test")
      .select(DotProduct(col("a"), col("b")).as("dot"))
      .as[Double].collect().toSeq
    assert(viaSql === viaCol)
    assert(viaSql === Seq(1.0 * 4 + 2 * 0.5 + 3 * (-1), 0.0))
  }

  test("graft_kmv via SQL is the KMinValues aggregate") {
    spark.range(100).select((col("id") % 10L).as("h"))
      .createOrReplaceTempView("graft_kmv_test")
    val viaSql = spark.sql(
      "SELECT graft_kmv(h, 4) AS kmv FROM graft_kmv_test")
      .head().getSeq[Long](0)
    assert(viaSql === Seq(0L, 1L, 2L, 3L))
  }

  test("graft_freq via SQL is the FrequentItems aggregate") {
    (Seq.fill(20)("hot") ++ (1 to 10).map(i => s"cold_$i")).toDF("s")
      .createOrReplaceTempView("graft_freq_test")
    val viaSql = spark.sql(
      "SELECT graft_freq(s, 4) AS cand FROM graft_freq_test")
      .head().getSeq[String](0)
    assert(viaSql.contains("hot"), "the heavy item must survive the sketch")
    assert(viaSql.size <= 4)
  }

  test("graft_kmv rejects a non-literal k") {
    spark.range(10).select(col("id").as("h"), lit(4).as("kk"))
      .createOrReplaceTempView("graft_kmv_bad")
    intercept[Exception] {
      spark.sql("SELECT graft_kmv(h, kk) FROM graft_kmv_bad").collect()
    }
  }
}
