package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SubwordCounts.subwordCounts

/** SubwordCounts (one byte pass) must agree with the regex definitions it
  * replaces — on the real corpus AND on adversarial strings (unicode,
  * class boundaries, empty) — because the driver's DuckDB oracle still
  * counts with RE2 regexes. */
class SubwordCountsSpec extends SparkSpec {
  import spark.implicits._

  private def regexTriple(c: org.apache.spark.sql.Column) = Seq(
    size(regexp_extract_all(c, lit("[a-z]+"), lit(0))).cast("long"),
    size(regexp_extract_all(c, lit("[0-9]+"), lit(0))).cast("long"),
    size(regexp_extract_all(c, lit("[^a-z0-9 ]"), lit(0))).cast("long"))

  test("equals the regex counts on the documents corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cmp = docs.select(
      subwordCounts(col("text")).as("fast"),
      array(regexTriple(col("text")): _*).as("slow"))
    assert(cmp.where(col("fast") =!= col("slow")).count() === 0)
  }

  test("equals the regex counts on adversarial strings") {
    val cases = Seq(
      "",                       // empty
      " ",                      // only separator
      "abc",                    // single run, no terminator
      "abc123def",              // runs adjacent with no space between
      "1a2b3c",                 // alternating single-char runs
      "!!!",                    // punct run counts per char
      "héllo wörld",            // multi-byte code points are single punct
      "日本語 text 42",          // CJK = 1 punct per code point
      "a-b_c.d",                // ascii punct between letter runs
      "ABC abc",                // uppercase is punct (corpus is lowercase)
      "ends with digit 7",
      "7 starts with digit",
      "tab\tand\nnewline")
    val df = cases.toDF("t")
    val got = df.select(subwordCounts(col("t")).as("fast"),
        array(regexTriple(col("t")): _*).as("slow"))
      .collect()
    got.zip(cases).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch on '$s': fast=${r.getSeq[Long](0)} slow=${r.getSeq[Long](1)}")
    }
  }

  test("matches java.util.regex on 2000 seeded random strings") {
    // the alphabet mixes every class edge: letters, digits, space, ascii
    // punct, 2-byte (é), 3-byte (日), and 4-byte (𝄞, a surrogate pair in
    // UTF-16 but one code point — regex counts it once, and so must we)
    val alphabet = "abz09 .,-!@é日𝄞".toCharArray // 𝄞 contributes 2 chars
    val rng = new scala.util.Random(4242)
    def regexCount(pat: String, s: String): Long =
      java.util.regex.Pattern.compile(pat).matcher(s).results().count()
    (1 to 2000).foreach { _ =>
      val n = rng.nextInt(40)
      val sb = new StringBuilder
      (1 to n).foreach(_ => sb.append(alphabet(rng.nextInt(alphabet.length))))
      // (a torn surrogate from the random picker is fine: regex counts it
      // as one [^a-z0-9 ] char, and UTF-8 encodes it as one '?' byte —
      // both sides see exactly one punct code point)
      val s = sb.toString
      val got = SubwordCounts.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toLongArray()
      val want = Array(regexCount("[a-z]+", s), regexCount("[0-9]+", s),
        regexCount("[^a-z0-9 ]", s))
      assert(got.toSeq == want.toSeq, s"mismatch on '$s'")
    }
  }

  test("interpreted eval (nullSafeEval) agrees with the codegen'd plan") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val s = "mixed 12x énd 99"
    // interpreted path: Expression.eval → nullSafeEval, no codegen involved
    val interp = SubwordCounts(Literal(s)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == Seq(3L, 2L, 1L))
    // codegen path: the same value through a real (whole-stage) plan
    val viaPlan = Seq(s).toDF("t")
      .select(subwordCounts(col("t"))).collect()(0).getSeq[Long](0)
    assert(viaPlan == interp)
  }
}
