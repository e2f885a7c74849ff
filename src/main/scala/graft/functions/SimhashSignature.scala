package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native Catalyst 60-bit SimHash over a token array, in one compiled pass.
 *
 * Semantics are IDENTICAL to the declarative form in Dedup.simhash's
 * oracle: per token occurrence, the 60-bit md5 hash
 * (`conv(substr(md5(tok),1,15),16,10)` == the digest's high 60 bits)
 * contributes +1 to bit-sum b when bit b is set, −1 otherwise; output bit
 * b is set iff its sum is positive. The difference is mechanical: the
 * declarative form explodes doc×token rows through a corpus-wide
 * groupBy(doc_id) carrying 60 sum columns, while this loops over the
 * array inside whole-stage codegen and never shuffles — per-document
 * state is one 60-int array.
 */
case class SimhashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_signature"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  /** Called from generated code via a bound reference. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](60)
    val md = SimhashSignature.digest.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        // high 60 bits of the first 8 digest bytes, big-endian ==
        // conv(substr(hex, 1, 15), 16, 10)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = h >>> 4
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) != 0L) sums(bit) += 1 else sums(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (sums(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashSig", this, classOf[SimhashSignature].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSignature =
    copy(child = newChild)
}

object SimhashSignature {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Column API: `simhashSignature(tokensCol)` → 60-bit long. */
  def simhashSignature(tokens: Column): Column =
    Bridge.column(SimhashSignature(Bridge.expression(tokens)))
}
