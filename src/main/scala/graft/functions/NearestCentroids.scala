package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/**
 * Native per-row nearest-centroid top-`nProbe`: the IVF/k-means coarse
 * assignment as ONE map-side expression over a driver-resident centroid
 * set — no join, no window, no Exchange.
 *
 * Semantics are IDENTICAL to the declarative form it replaced
 * (`crossJoin(broadcast(cents))` scored by [[DotProduct]], ranked
 * `row_number() over (partition by id order by dot desc, cid asc)`,
 * kept while rank ≤ nProbe): the dot is the same exact float→double
 * widening with strict left-to-right IEEE accumulation, and ties on the
 * dot break to the LOWEST centroid id (centroids are iterated
 * cid-ascending and a later candidate must beat a slot STRICTLY to take
 * it). Output = the ≤ nProbe winning cids in rank order; `explode` it to
 * recover the one-row-per-(id, probed centroid) shape.
 *
 * Why an expression and not the window: partitioning the ranking window
 * by the corpus row id forces an Exchange hash-partitioned on that id —
 * the ENTIRE corpus, embedding payloads included, shuffles once per
 * assignment pass (and once per Lloyd iteration when training). The
 * centroid set is C×D floats and driver-small by construction (seeded or
 * Lloyd-updated via a C×D collect), so the assignment is a pure per-row
 * computation; this expression runs it inside whole-stage codegen and
 * keeps the corpus scan map-only.
 *
 * A centroid whose vector length differs from the row's embedding is
 * skipped (the declarative twin scored it NULL, which sorted last); if
 * fewer than nProbe centroids are scorable the output is shorter.
 */
case class NearestCentroids(child: Expression, cids: Array[Long],
                            cents: Array[Array[Float]], nProbe: Int)
  extends UnaryExpression {

  require(cids.length == cents.length,
    s"cids/cents length mismatch: ${cids.length} vs ${cents.length}")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
  require((1 until cids.length).forall(i => cids(i - 1) < cids(i)),
    "centroid ids must be strictly ascending (sort before constructing)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  /** Called from generated code via a bound reference. */
  def compute(xs: ArrayData): GenericArrayData = {
    val n = xs.numElements()
    val c = cids.length
    val m = if (nProbe < c) nProbe else c
    // rank slots, dot desc; ties keep the earlier (lower-cid) holder
    val bestD = new Array[Double](m)
    val bestC = new Array[Long](m)
    var cnt = 0
    var ci = 0
    while (ci < c) {
      val ce = cents(ci)
      if (ce.length == n) {
        var d = 0.0
        var i = 0
        while (i < n) {
          d += xs.getFloat(i).toDouble * ce(i).toDouble
          i += 1
        }
        // insertion into the sorted prefix: strictly-greater displaces
        var pos = cnt
        while (pos > 0 && d > bestD(pos - 1)) pos -= 1
        if (pos < m) {
          val last = if (cnt < m) cnt else m - 1
          var j = last
          while (j > pos) {
            bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1
          }
          bestD(pos) = d
          bestC(pos) = cids(ci)
          if (cnt < m) cnt += 1
        }
      }
      ci += 1
    }
    if (cnt == m) new GenericArrayData(bestC)
    else new GenericArrayData(java.util.Arrays.copyOf(bestC, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  /** Column API: the ≤ nProbe nearest centroid ids in rank order (dot
    * desc, cid-asc ties). `centroids` = (cid, vector) pairs in any order;
    * sorted here so the tie-break is the construction invariant. */
  def nearest(embedding: Column, centroids: Seq[(Long, Array[Float])],
              nProbe: Int): Column = {
    val sorted = centroids.sortBy(_._1)
    Bridge.column(NearestCentroids(Bridge.expression(embedding),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, nProbe))
  }
}
