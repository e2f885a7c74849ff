package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * High `bits` (≤ 60) of md5(utf8(s)) as a non-negative long — the native
 * form of the engine's portable hash family root
 * `conv(substr(md5(s), 1, bits/4), 16, 10)` (TextOps.tokenHash/md5Gate;
 * DuckDB twin `CAST(('0x'||substr(md5(s),1,n)) AS BIGINT)`).
 *
 * Value-identical to the declarative spelling (Md5HighBitsSpec pins it on
 * random/unicode/empty inputs): the digest's leading hex chars ARE its
 * leading bits, so reading n hex chars base-16 ≡ taking the first 4·n
 * bits of the raw digest. What the declarative chain pays per row — and
 * this skips — is the string round-trip: hex-ENCODE 16 bytes to a 32-char
 * string, substring-copy it, then radix-PARSE it back; only the digest
 * itself remains. The hash family stays md5 because it is the one hash
 * Spark and DuckDB compute bit-identically (the oracle contract); this
 * changes the constant, never the value. Used on the hot per-shingle /
 * per-gram paths (jaccard blocking, decontamination grams, boilerplate
 * spans, KMV sketch input) where the hash IS the scan cost.
 */
case class Md5HighBits(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 60 && bits % 4 == 0,
    s"bits must be a positive multiple of 4 up to 60 (hex-prefix-expressible), got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_high_bits"

  override def nullSafeEval(s: Any): Any =
    Md5HighBits.compute(s.asInstanceOf[UTF8String].getBytes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5HighBits.compute($s.getBytes(), $bits);")

  override protected def withNewChildInternal(newChild: Expression): Md5HighBits =
    copy(child = newChild)
}

object Md5HighBits {

  /** One MessageDigest per thread, reset between rows: `DigestUtils.md5`
    * allocates a fresh MessageDigest (and its internal buffers) on EVERY
    * call, and this sits on the hottest per-shingle/per-gram paths in
    * the engine where the hash is the scan cost — a thread-local
    * instance is a free constant-factor win there (task threads are
    * long-lived, so the instance amortizes across millions of rows).
    * `digest()` resets the instance after each use, so rows never bleed
    * state into each other. */
  private val localMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First `bits` bits of md5(b), big-endian, as a long (bits ≤ 60 keeps
    * it non-negative). Called from generated code — keep it static-shaped. */
  def compute(b: Array[Byte], bits: Int): Long = {
    val d = localMd5.get().digest(b)
    var v = 0L
    var taken = 0
    var i = 0
    while (taken + 8 <= bits) {
      v = (v << 8) | (d(i) & 0xFFL)
      taken += 8
      i += 1
    }
    if (taken < bits) {
      val rem = bits - taken // 4 when bits % 8 != 0
      v = (v << rem) | ((d(i) & 0xFFL) >>> (8 - rem))
    }
    v
  }

  /** Column API: high-60-bit token hash (≡ TextOps declarative twin). */
  def hash60(s: Column): Column =
    Bridge.column(Md5HighBits(Bridge.expression(s), 60))

  /** Column API: 32-bit sampling gate. */
  def hash32(s: Column): Column =
    Bridge.column(Md5HighBits(Bridge.expression(s), 32))
}
