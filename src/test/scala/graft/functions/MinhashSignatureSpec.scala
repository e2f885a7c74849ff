package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MinhashSignature.minhashSignature
import graft.ops.TextOps.{hashMember, shingles, tokens}
import graft.queries.Tables

class MinhashSignatureSpec extends SparkSpec {

  test("native signature is identical to the declarative hashMember minima") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), shingles(tokens(col("text"))).as("shs"))
    val native = docs
      .select(col("doc_id"), minhashSignature(col("shs"), 8).as("mhs"))
      .select(col("doc_id") +:
        (0 until 8).map(i => element_at(col("mhs"), i + 1).as(s"mh$i")): _*)
    val declarative = docs
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .groupBy(col("doc_id"))
      .agg(min(hashMember(0, col("sh"))).as("mh0"),
        (1 until 8).map(i => min(hashMember(i, col("sh"))).as(s"mh$i")): _*)
    assert(native.count() > 0)
    assert(native.exceptAll(declarative).isEmpty && declarative.exceptAll(native).isEmpty)
  }

  test("empty and null arrays yield null signatures") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq("a", "b"))), (2L, Some(Seq.empty[String])), (3L, None))
      .toDF("id", "shs")
      .select(col("id"), minhashSignature(col("shs"), 8).as("mhs"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isDefined)
    assert(rows(2L).isEmpty)
    assert(rows(3L).isEmpty)
  }
}
