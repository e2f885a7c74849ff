package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/**
 * Random-hyperplane LSH bucketing (Charikar 2002 sign hashes) as ONE native
 * Catalyst expression: for `bands × bitsPerBand` hyperplanes, bit r of band
 * j is sign(v · plane[j·bits+r]); returns the `bands` bucket codes as
 * array<long>.
 *
 * Why an expression and not 128 column formulas: the declarative form
 * (`when(DotProduct(v, typedLit(plane)) >= 0, 1L<<r)` folded per band)
 * plants 128 64-float literal arrays in the plan — analysis/optimization
 * walks thousands of literal nodes on EVERY fresh query, dominating the
 * operator's wall time at small scale and bloating plan shipping at large.
 * Here the plane matrix rides along as one codegen reference object and the
 * generated code is a tight primitive triple loop; the plan holds a single
 * node. Dot semantics match [[DotProduct]] exactly (float→double widening,
 * left-to-right accumulation).
 */
case class HyperplaneBuckets(
    child: Expression,
    planes: Array[Array[Float]],
    bands: Int,
    bitsPerBand: Int) extends UnaryExpression {

  require(planes.length == bands * bitsPerBand,
    s"need ${bands * bitsPerBand} planes, got ${planes.length}")

  /** All planes share one dimensionality; a vector of any other length
    * evals to NULL (and posexplode then drops the row) — matching
    * [[DotProduct]]'s null-on-mismatch rather than silently bucketing a
    * truncated prefix, which would quietly distort the LSH S-curve. */
  private val dim: Int = planes.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var bucket = 0L
      var r = 0
      while (r < bitsPerBand) {
        val p = planes(j * bitsPerBand + r)
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += v.getFloat(i).toDouble * p(i); i += 1 }
        if (acc >= 0) bucket |= (1L << r)
        r += 1
      }
      out(j) = bucket
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
    val out = ctx.freshName("out")
    val j = ctx.freshName("j")
    val r = ctx.freshName("r")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val p = ctx.freshName("p")
    val bucket = ctx.freshName("bucket")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$bands];
         |  for (int $j = 0; $j < $bands; $j++) {
         |    long $bucket = 0L;
         |    for (int $r = 0; $r < $bitsPerBand; $r++) {
         |      float[] $p = $planesRef[$j * $bitsPerBand + $r];
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $acc += ((double) $v.getFloat($i)) * ((double) $p[$i]);
         |      }
         |      if ($acc >= 0) $bucket |= (1L << $r);
         |    }
         |    $out[$j] = $bucket;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Column API over an array<float> embedding column. */
  def apply(v: Column, planes: Array[Array[Float]],
            bands: Int, bitsPerBand: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(v), planes, bands, bitsPerBand))
}
