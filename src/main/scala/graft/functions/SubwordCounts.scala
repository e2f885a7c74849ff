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
 * Native Catalyst subword-unit counter: one compiled byte pass instead of
 * FOUR regex scans.
 *
 * Semantics are IDENTICAL to the regex forms the text_subwords oracle
 * keeps (and PlanAudit/SubwordSpec prove it):
 *
 *   out(0) = count of matches of  [a-z]+        (maximal letter runs)
 *   out(1) = count of matches of  [0-9]+        (maximal digit runs)
 *   out(2) = count of matches of  [^a-z0-9 ]    (one per code point)
 *
 * n_units = sum of the three — the classes are disjoint, which is also
 * what makes Java-regex and RE2 agree exactly.
 *
 * Why bytes: the ASCII classes only ever match ASCII bytes, and in UTF-8
 * every non-ASCII CODE POINT is one lead byte plus continuation bytes
 * (0x80-0xBF, which never match anything) — so counting lead bytes counts
 * code points, exactly what both regex engines count for [^a-z0-9 ].
 * No String materialization, no regex machinery: measured 93× data-linear
 * cost at the 100× SF dropped to the price of one memory sweep.
 */
case class SubwordCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "subword_counts"

  override def nullSafeEval(v: Any): Any =
    SubwordCounts.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SubwordCounts.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): SubwordCounts =
    copy(child = newChild)
}

object SubwordCounts {

  /** Static so generated code calls it directly (no boxing, no dispatch). */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    var words = 0L; var nums = 0L; var punct = 0L
    // 0 = outside any run, 1 = in a letter run, 2 = in a digit run
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b & 0xc0) == 0x80) {
        // UTF-8 continuation byte: interior of a code point already
        // counted (as punct) at its lead byte — state unchanged
      } else if (b >= 'a' && b <= 'z') {
        if (state != 1) { words += 1; state = 1 }
      } else if (b >= '0' && b <= '9') {
        if (state != 2) { nums += 1; state = 2 }
      } else if (b == ' ') {
        state = 0
      } else {
        // any other ASCII byte, or a non-ASCII lead byte = one code point
        punct += 1
        state = 0
      }
      i += 1
    }
    new GenericArrayData(Array(words, nums, punct))
  }

  /** Column API: array<long> of (letter runs, digit runs, punct chars). */
  def subwordCounts(text: Column): Column =
    Bridge.column(SubwordCounts(Bridge.expression(text)))
}
