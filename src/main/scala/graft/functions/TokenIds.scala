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
 * Native Catalyst tokenizer-to-ids: split on single spaces and map each
 * token to its vocabulary id (1-based rank; OOV → 0) through a REAL hash
 * map.
 *
 * Semantics are IDENTICAL to
 * `transform(split(text," "), t => coalesce(element_at(map_literal, t), 0))`
 * — single-space split with limit -1 (empty tokens included) and exact
 * string membership. The difference is the lookup: Catalyst's
 * `element_at` on a map LITERAL is a linear scan of the entries per
 * probe, so a 100-word vocabulary costs ~100 string comparisons per
 * token — measured 47.9s over 5M docs at the 1000× SF; one hash probe
 * per token brings the whole query to the price of the scan.
 */
case class TokenIds(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_ids"

  @transient private lazy val idMap: java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (t, i) => m.put(t, i + 1L) }
    m
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  /** Called from generated code via a bound reference. */
  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    // token count = separators + 1 (split limit -1 semantics)
    var n = 1
    var i = 0
    while (i < str.length) { if (str.charAt(i) == ' ') n += 1; i += 1 }
    val out = new Array[Long](n)
    val m = idMap
    var start = 0
    var j = 0
    while (j < n) {
      val sp = str.indexOf(' ', start)
      val end = if (sp < 0) str.length else sp
      // getOrDefault: a plain get on a miss returns null, and unboxing
      // null to Long throws — OOV must be id 0
      out(j) = m.getOrDefault(str.substring(start, end), 0L)
      j += 1
      start = end + 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenIds", this, classOf[TokenIds].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenIds =
    copy(child = newChild)
}

object TokenIds {
  /** Column API: array<long> of vocabulary ids (1-based rank, OOV = 0). */
  def tokenIds(text: Column, vocab: Seq[String]): Column =
    Bridge.column(TokenIds(Bridge.expression(text), vocab))
}
