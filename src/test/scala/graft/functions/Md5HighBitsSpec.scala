package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native digest-prefix hash ≡ the declarative hex-parse spelling the
  * DuckDB oracles twin — on every input class the corpus can contain. */
class Md5HighBitsSpec extends SparkSpec {

  import spark.implicits._

  private val inputs: Seq[String] = Seq(
    "", " ", "a", "the quick brown fox", "tab\there", "line\nbreak",
    "ünïcödé ßtrìng — 中文 и русский",
    "0", "-42", "9223372036854775807",
    "a" * 10000) ++ (1 to 200).map(i => s"doc $i token${i * 7919}")

  test("60-bit form equals conv(substr(md5(s),1,15),16,10) on all inputs") {
    val df = inputs.toDF("s").repartition(3)
    val rows = df.select(
      Md5HighBits.hash60(col("s")).as("native"),
      conv(substr(md5(col("s")), lit(1), lit(15)), 16, 10).cast("long")
        .as("declarative")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(rows.length === inputs.length)
  }

  test("32-bit form equals conv(substr(md5(s),1,8),16,10) on all inputs") {
    val df = inputs.toDF("s")
    val rows = df.select(
      Md5HighBits.hash32(col("s")).as("native"),
      conv(substr(md5(col("s")), lit(1), lit(8)), 16, 10).cast("long")
        .as("declarative")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("interpreted eval agrees with codegen (null included)") {
    // Column path above runs whole-stage codegen; eval the expression
    // directly for the interpreted path
    val e = Md5HighBits(
      org.apache.spark.sql.catalyst.expressions.Literal("abc"), 60)
    val viaEval = e.eval(null).asInstanceOf[Long]
    val viaDf = Seq("abc").toDF("s")
      .select(Md5HighBits.hash60(col("s"))).head().getLong(0)
    assert(viaEval === viaDf)
    val n = Md5HighBits(org.apache.spark.sql.catalyst.expressions.Literal(
      null, org.apache.spark.sql.types.StringType), 60)
    assert(n.eval(null) === null)
  }

  test("rejects non-hex-expressible widths and non-string inputs") {
    intercept[IllegalArgumentException] {
      Md5HighBits(org.apache.spark.sql.catalyst.expressions.Literal("x"), 61)
    }
    intercept[Exception] {
      spark.range(1).select(
        graft.functions.Md5HighBits.hash60(col("id")).as("h")).collect()
    }
  }
}
