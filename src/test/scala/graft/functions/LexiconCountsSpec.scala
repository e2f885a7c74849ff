package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.LexiconCounts.lexiconCounts

/** LexiconCounts (one string pass) must agree with the declarative
  * split + filter + isin forms it replaces — the DuckDB oracles still
  * count with string_split + list_filter. */
class LexiconCountsSpec extends SparkSpec {
  import spark.implicits._

  private val lexicons = Seq(
    Seq("the", "a", "and"), Seq("el", "la", "y"))

  private def declarative(c: org.apache.spark.sql.Column) = {
    val toks = split(c, " ")
    array((size(toks).cast("long") +:
      lexicons.map(lex =>
        size(filter(toks, t => t.isin(lex: _*))).cast("long"))): _*)
  }

  test("equals split+filter+isin on the documents corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cmp = docs.select(
      lexiconCounts(col("text"), lexicons).as("fast"),
      declarative(col("text")).as("slow"))
    assert(cmp.where(col("fast") =!= col("slow")).count() === 0)
  }

  test("equals the declarative form on split-semantics edge cases") {
    val cases = Seq(
      "",                  // split("", " ") = [""] → 1 token, 0 hits
      "the",               // single token, one hit
      "the the the",       // occurrences counted, not distinct
      " the",              // leading space → empty first token
      "the ",              // trailing space → empty last token (limit -1)
      "a  y",              // double space → empty middle token
      "THE a And y el",    // case-sensitive membership
      "la la la el")
    val df = cases.toDF("t")
    val got = df.select(lexiconCounts(col("t"), lexicons).as("fast"),
        declarative(col("t")).as("slow")).collect()
    got.zip(cases).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch on '$s': fast=${r.getSeq[Long](0)} slow=${r.getSeq[Long](1)}")
    }
  }

  test("interpreted eval agrees with the codegen'd plan") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val s = "the la the y"
    val interp = LexiconCounts(Literal(s), lexicons).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == Seq(4L, 2L, 2L)) // 4 tokens; the×2; la,y
    val viaPlan = Seq(s).toDF("t")
      .select(lexiconCounts(col("t"), lexicons)).collect()(0).getSeq[Long](0)
    assert(viaPlan == interp)
  }
}
