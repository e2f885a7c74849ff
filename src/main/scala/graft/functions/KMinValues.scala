package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * `k_min_values(h, k)`: the `k` smallest DISTINCT long values of the
 * group, as a sorted ascending array — the KMV (k-minimum-values)
 * distinct-count sketch (Bar-Yossef et al. 2002; Beyer et al. 2007): for
 * uniformly-hashed inputs, `(k-1) * H / h_k` estimates the distinct count
 * (H = hash-space size, `h_k` = the kth minimum), with relative error
 * ~1/sqrt(k).
 *
 * Why an imperative aggregate and not `DISTINCT h ORDER BY h LIMIT k`:
 * the declarative form pays a full distinct SHUFFLE of every hash before
 * the top-k — at 100 TB that is the single most expensive thing a count
 * can do. This buffer is a bounded treap-free TreeSet of at most `k`
 * longs (~2 KB at k=256) maintained in ONE pass: partial aggregation
 * runs map-side, merge is a bounded set-union, and the only thing that
 * crosses the wire per partition is the k-element buffer — the sketch
 * property that makes distinct estimation viable on arbitrarily large
 * scans (and mergeable across shards/days for free).
 *
 * Duplicate hashes collapse (set semantics — required: KMV's estimator
 * is over distinct order statistics); values are exact order statistics,
 * not approximations, so the result is DETERMINISTIC for any input set,
 * independent of partitioning/merge order — an engine that computes the
 * same k minima (e.g. the DuckDB oracle's `DISTINCT ... ORDER BY ...
 * LIMIT k`) agrees bit-for-bit.
 */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] with UnaryLike[Expression] {

  require(k >= 2, s"k_min_values needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "k_min_values"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], x: Long): Unit =
    if (buf.size < k) { buf += x; () }
    else if (x < buf.last) {        // strictly below the current kth min
      buf += x                      // set add: duplicate is a no-op ...
      if (buf.size > k) { buf -= buf.last; () } // ... so only trim on growth
    }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray) // TreeSet iterates ascending

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

object KMinValues {
  /** Column API: `kMinValues(col("h"), 256)`. */
  def kMinValues(child: Column, k: Int): Column =
    Bridge.column(KMinValues(Bridge.expression(child), k)
      .toAggregateExpression())

  /** The KMV NDV estimator over a sketch column: a sub-k sketch IS the
    * exact distinct set (low-cardinality exact answer); past k, the
    * standard `(k-1)·2^60/h_k` over the 60-bit hash space. CaseWhen
    * evaluates lazily, so `element_at(·, k)` never runs on a short
    * sketch. ONE definition (cat_ndv, stream_ndv) so the estimator
    * convention can never drift between the engine's call sites and
    * their oracles' CASE spelling. */
  def ndvEstimate(kmv: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, floor, lit, size, when}
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
        element_at(kmv, k)))
  }
}
