package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.NgramRepetition.ngramRepetition
import graft.ops.TextOps

/** NgramRepetition (one tokenize pass, per-doc string set) must agree
  * with TextOps.shingles' declarative counts — the DuckDB oracle still
  * counts with list_distinct over slices. */
class NgramRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(c: org.apache.spark.sql.Column) = {
    val toks = split(c, " ")
    array(
      when(size(toks) < 2, 1).otherwise(size(toks) - 1).cast("long"),
      size(TextOps.shingles(toks, 2)).cast("long"),
      when(size(toks) < 5, 1).otherwise(size(toks) - 4).cast("long"),
      size(TextOps.shingles(toks, 5)).cast("long"))
  }

  test("equals the shingle counts on the documents corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cmp = docs.select(
      ngramRepetition(col("text"), Seq(2, 5)).as("fast"),
      declarative(col("text")).as("slow"))
    assert(cmp.where(col("fast") =!= col("slow")).count() === 0)
  }

  test("equals the declarative form on edge cases") {
    val cases = Seq(
      "",                        // 1 empty token → whole-text shingle
      "one",                     // shorter than both n
      "a b c d",                 // shorter than 5 only
      "a b a b a",               // repeated bigrams
      "x x x x x x x x",        // maximal repetition
      "a  b a  b",               // empty tokens participate in shingles
      "w1 w2 w3 w4 w5 w6 w1 w2 w3 w4 w5 w6")
    val got = cases.toDF("t")
      .select(ngramRepetition(col("t"), Seq(2, 5)).as("fast"),
        declarative(col("t")).as("slow")).collect()
    got.zip(cases).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch on '$s': ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("interpreted eval agrees with the codegen'd plan") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val s = "a b a b a"
    val interp = NgramRepetition(Literal(s), Seq(2, 5)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == Seq(4L, 2L, 1L, 1L)) // bigrams: ab,ba,ab,ba; len=5 → one 5-gram
    val viaPlan = Seq(s).toDF("t")
      .select(ngramRepetition(col("t"), Seq(2, 5))).collect()(0).getSeq[Long](0)
    assert(viaPlan == interp)
  }
}
