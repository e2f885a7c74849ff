package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native Catalyst minhash signature: K minima of the md5-derived 32-bit
 * hash family over a shingle array, in one compiled pass.
 *
 * Semantics are IDENTICAL to the declarative form used by the DuckDB
 * oracle — for member i, `min(conv(substr(md5((i/4)||':'||s), 1+8*(i%4), 8), 16, 10))`
 * over the array (TextOps.hashMember layout: one digest feeds 4 members,
 * hex chars [8m, 8m+8) = digest bytes [4m, 4m+4) read unsigned
 * big-endian). The difference is mechanical: higher-order `transform`
 * evaluates its md5 lambda through the interpreter per element with a
 * UTF8String round-trip per digest, while this loops over the array
 * inside whole-stage codegen, hashing each shingle's bytes directly —
 * the signature stage is the entire cost of minhash at corpus scale.
 */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k % 4 == 0, s"k must be a multiple of 4 (members per digest), got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  /** One compiled pass: 2 digests per shingle (k=8), minima in a local
    * array. Called from generated code via a bound reference. */
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null // array_min of an empty array is NULL
    val digests = k / 4
    val mins = Array.fill(k)(Long.MaxValue)
    val md = MinhashSignature.digest.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val sBytes = s.getBytes
        var g = 0
        while (g < digests) {
          md.reset()
          md.update(MinhashSignature.prefixes(g))
          md.update(sBytes)
          val d = md.digest()
          var m = 0
          while (m < 4) {
            // unsigned big-endian 32-bit word m of the digest ==
            // conv(substr(hex, 1+8m, 8), 16, 10)
            val v = ((d(4 * m) & 0xffL) << 24) | ((d(4 * m + 1) & 0xffL) << 16) |
              ((d(4 * m + 2) & 0xffL) << 8) | (d(4 * m + 3) & 0xffL)
            val idx = g * 4 + m
            if (v < mins(idx)) mins(idx) = v
            m += 1
          }
          g += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSignature].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = $ref.compute($arr);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  /** md5 digest per thread (MessageDigest is not thread-safe). */
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Family-group prefixes "0:", "1:", ... as utf-8 bytes (supports k ≤ 40). */
  private val prefixes: Array[Array[Byte]] =
    (0 until 10).map(g => s"$g:".getBytes("UTF-8")).toArray

  /** Column API: `minhashSignature(shinglesCol, 8)` → array<long> of K minima. */
  def minhashSignature(shingles: Column, k: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(shingles), k))
}
