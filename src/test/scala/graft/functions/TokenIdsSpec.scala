package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TokenIds.tokenIds

/** TokenIds (split + one hash probe per token) must agree with the
  * map-literal transform it replaces — the DuckDB oracle still looks up
  * through a MAP in a list lambda. */
class TokenIdsSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("the", "a", "and", "of")

  private def declarative(c: org.apache.spark.sql.Column) = {
    val vmap = map(vocab.zipWithIndex.flatMap { case (t, i) =>
      Seq(lit(t), lit((i + 1).toLong)) }: _*)
    transform(split(c, " "), t => coalesce(element_at(vmap, t), lit(0L)))
  }

  test("equals the map-literal transform on the documents corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cmp = docs.select(tokenIds(col("text"), vocab).as("fast"),
      declarative(col("text")).as("slow"))
    assert(cmp.where(col("fast") =!= col("slow")).count() === 0)
  }

  test("equals the declarative form on split-semantics edge cases") {
    val cases = Seq("", " ", "the", "the the", " the", "the ", "a  of",
      "THE unknown and", "of of of of")
    val got = cases.toDF("t")
      .select(tokenIds(col("t"), vocab).as("fast"),
        declarative(col("t")).as("slow")).collect()
    got.zip(cases).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch on '$s': ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("empty vocabulary maps everything to OOV; interpreted eval agrees") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = TokenIds(Literal("x y z"), Seq.empty).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == Seq(0L, 0L, 0L))
    val viaPlan = Seq("the a zz").toDF("t")
      .select(tokenIds(col("t"), vocab)).collect()(0).getSeq[Long](0)
    assert(viaPlan == Seq(1L, 2L, 0L))
  }
}
