package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst n-gram repetition stats: for each n in `ns`, the total
 * and DISTINCT word-n-gram counts of the document, in one tokenize pass.
 *
 * Output array: [total(n₀), distinct(n₀), total(n₁), distinct(n₁), ...].
 * Semantics are IDENTICAL to the declarative twin the oracle keeps:
 * tokens = split(text, " ") (limit -1, empties included); documents
 * shorter than n collapse to ONE whole-text shingle (total=distinct=1,
 * TextOps.shingles' rule); distinctness is over the exact joined-string
 * shingle (a HashSet of strings — never a 64-bit hash, whose collisions
 * would silently diverge from the oracle's list_distinct).
 *
 * Why: the declarative form builds n zipped array slices plus an
 * array_distinct per n per document — text_repetition measured 47s over
 * 5M docs at the 1000× SF, all array machinery; this walks the token
 * array once per n with a per-document set.
 */
case class NgramRepetition(child: Expression, ns: Seq[Int])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_repetition"

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  /** Called from generated code via a bound reference. */
  def compute(s: UTF8String): GenericArrayData = {
    val toks = splitTokens(s.toString)
    val out = new Array[Long](2 * ns.length)
    var i = 0
    while (i < ns.length) {
      val n = ns(i)
      if (toks.length < n) {
        out(2 * i) = 1L     // whole-text shingle
        out(2 * i + 1) = 1L
      } else {
        val total = toks.length - n + 1
        val seen = new java.util.HashSet[String](total * 2)
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < total) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(toks(j + k))
            k += 1
          }
          seen.add(sb.toString)
          j += 1
        }
        out(2 * i) = total.toLong
        out(2 * i + 1) = seen.size.toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  // split(text, " ") with limit -1: separators + 1 fields, empties kept
  private def splitTokens(str: String): Array[String] = {
    var n = 1
    var i = 0
    while (i < str.length) { if (str.charAt(i) == ' ') n += 1; i += 1 }
    val out = new Array[String](n)
    var start = 0
    var j = 0
    while (j < n) {
      val sp = str.indexOf(' ', start)
      val end = if (sp < 0) str.length else sp
      out(j) = str.substring(start, end)
      j += 1
      start = end + 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramRep", this, classOf[NgramRepetition].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
    copy(child = newChild)
}

object NgramRepetition {
  /** Column API: array<long> of (total, distinct) per requested n. */
  def ngramRepetition(text: Column, ns: Seq[Int]): Column =
    Bridge.column(NgramRepetition(Bridge.expression(text), ns))
}
