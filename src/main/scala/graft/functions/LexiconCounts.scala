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
 * Native Catalyst lexicon-hit counter: one pass over the text instead of
 * `split` + K interpreted `filter(toks, t => t.isin(lexicon))` lambdas.
 *
 * Output array: [n_tokens, hits(lexicon 0), ..., hits(lexicon K-1)].
 * Semantics are IDENTICAL to the declarative forms the oracles keep:
 *
 *   n_tokens = size(split(text, " "))      — single-space split, limit -1:
 *              N separators → N+1 fields, empties included ("" → 1 token)
 *   hits(i)  = size(filter(split(text," "), t => t.isin(lexicons(i):_*)))
 *              — one count per token OCCURRENCE in the lexicon
 *
 * Why it matters: the HOF filter evaluates an interpreted lambda per
 * token × lexicon — text_langid (4 lexicons over 5M docs at the 1000×
 * SF) measured 57s of pure lambda dispatch; this walks the string once
 * with K tiny hash-set probes per token.
 */
case class LexiconCounts(child: Expression, lexicons: Seq[Seq[String]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lexicon_counts"

  @transient private lazy val lexSets: Array[java.util.HashSet[String]] =
    lexicons.map { lex =>
      val s = new java.util.HashSet[String]()
      lex.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  /** Called from generated code via a bound reference. */
  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val sets = lexSets
    val out = new Array[Long](1 + sets.length)
    var start = 0
    var done = false
    while (!done) {
      val sp = str.indexOf(' ', start)
      val end = if (sp < 0) str.length else sp
      val tok = str.substring(start, end)
      out(0) += 1
      var i = 0
      while (i < sets.length) {
        if (sets(i).contains(tok)) out(i + 1) += 1
        i += 1
      }
      if (sp < 0) done = true else start = sp + 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lexiconCounts", this,
      classOf[LexiconCounts].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconCounts =
    copy(child = newChild)
}

object LexiconCounts {
  /** Column API: array<long> of (n_tokens, hits per lexicon). */
  def lexiconCounts(text: Column, lexicons: Seq[Seq[String]]): Column =
    Bridge.column(LexiconCounts(Bridge.expression(text), lexicons))
}
