package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

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
 * `collect_capped(x, cap)`: collect the group's long values as a SORTED
 * array, or NULL if the group has more than `cap` members.
 *
 * This is the scale-safe grouping primitive for LSH-style blocking
 * (jaccard shingle groups, band buckets): a plain `collect_list` has an
 * unbounded aggregation buffer, so one boilerplate blocking key occurring
 * in m documents builds an m-element array on a single reducer — at corpus
 * scale that's an OOM, and the pair expansion downstream would be C(m,2)
 * anyway. Here the buffer saturates at cap+1 elements (update and merge
 * both stop appending past that), so memory per group is O(cap) no matter
 * how hot the key, and the final NULL both marks and *enforces* the
 * document-frequency cap in the same single aggregation pass — no separate
 * df-count shuffle + anti-join needed.
 *
 * Sorting at eval (≤ cap+1 elements) makes downstream `a < b` pair
 * expansion deterministic and order-independent of partitioning.
 */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "collect_capped"

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null && buf.length <= cap) buf += v.asInstanceOf[Long]
    buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    // saturating append: once past cap+1 the exact contents no longer
    // matter (the group evals to NULL), only that length stays > cap
    var i = 0
    while (i < other.length && buf.length <= cap) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    if (buf.length > cap) null
    else new GenericArrayData(buf.sorted.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}

object CollectCapped {
  /** Column API: `collectCapped(col("doc_id"), 128)`. */
  def collectCapped(child: Column, cap: Int): Column =
    Bridge.column(CollectCapped(Bridge.expression(child), cap)
      .toAggregateExpression())
}
