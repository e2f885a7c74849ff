package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SimhashSignature.simhashSignature
import graft.ops.TextOps.{tokenHash, tokens}
import graft.queries.Tables

class SimhashSignatureSpec extends SparkSpec {

  test("native signature equals the declarative 60-bit sign-sum form") {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val native = docs.select(col("doc_id"), simhashSignature(tokens(col("text"))).as("simhash"))
    val bitSums = (0 until 60).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"s$b")
    }
    val declarative = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), tokenHash(col("tok")).as("h"))
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    assert(native.count() > 0)
    assert(native.exceptAll(declarative).isEmpty && declarative.exceptAll(native).isEmpty)
  }

  test("null token arrays yield null; empty arrays yield 0") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq("a", "b", "a"))), (2L, Some(Seq.empty[String])), (3L, None))
      .toDF("id", "toks")
      .select(col("id"), simhashSignature(col("toks")).as("sh"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isDefined)
    assert(rows(2L) === Some(0L))
    assert(rows(3L).isEmpty)
  }
}
