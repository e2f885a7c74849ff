package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `freq_items(s, k)`: Misra–Gries heavy-hitter summary — the candidate
 * items of a string column, as at most `k` strings. GUARANTEE (the only
 * property callers may rely on): every item whose true frequency exceeds
 * n/k is present in the result; per-item counts are maintained internally
 * with undercount ≤ n/k and survive arbitrary merge trees at the same
 * bound (Misra & Gries 1982; the mergeable-summaries merge of Agarwal et
 * al. 2012: pointwise sum, then subtract the (k+1)-th largest count and
 * drop non-positives).
 *
 * Why a bounded sketch and not `GROUP BY item`: the exact group-by
 * shuffles EVERY distinct item — at 100 TB of high-cardinality data that
 * is the whole table crossing the wire to find a handful of hot keys.
 * This buffer is ≤ k (item, count) pairs (~KBs): partials run map-side,
 * merges move k pairs per partition, and the candidates come back in one
 * pass. The counts themselves are merge-order-DEPENDENT (only the bound
 * is deterministic), so the sketch exposes candidates only; an exact
 * caller ([[graft.queries.OlapQueries]] q_heavy_hitters) re-counts the
 * ≤ k candidates in a second bounded pass — the standard two-pass exact
 * heavy-hitters plan, deterministic end to end.
 */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"freq_items needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Classic MG step: known item +1; room → insert; full → decrement ALL
    * (the pigeonhole debit that buys the n/k bound), dropping zeros. */
  private def add(buf: mutable.HashMap[String, Long], item: String,
                  w: Long): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + w)
      case None if buf.size < k => buf.update(item, w)
      case None =>
        // debit min(w, smallest count) from everyone; re-add remainder
        val debit = math.min(w, buf.valuesIterator.min)
        buf.mapValuesInPlace((_, c) => c - debit)
        buf.filterInPlace((_, c) => c > 0)
        if (w > debit) add(buf, item, w - debit)
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  /** Mergeable-summaries merge: pointwise sum, then if over k entries
    * subtract the (k+1)-th largest count and drop non-positives —
    * preserves the ≤ n/k undercount bound for the merged stream. */
  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      val kth = buf.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      buf.mapValuesInPlace((_, c) => c - kth)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  /** Candidates only, count-descending then lexicographic for a stable
    * presentation (the counts themselves are merge-order-dependent and
    * deliberately not exposed). */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toSeq.sortBy { case (i, c) => (-c, i) }
      .map { case (i, _) => UTF8String.fromString(i) }.toArray[Any])

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toSeq
    val bytes = items.map { case (i, _) => i.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.size)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)
}

object FrequentItems {
  /** Column API: `freqItems(col("item"), 64)`. */
  def freqItems(child: Column, k: Int): Column =
    Bridge.column(FrequentItems(Bridge.expression(child), k)
      .toAggregateExpression())
}
