package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.Attribution._

/** Attribution fold semantics (pure) + incremental-equals-batch parity. */
class AttributionSpec extends AnyFunSuite {

  private def fold(st: Option[Touch], evs: (Long, Long, String, Long)*) =
    foldUser(7L, evs.sortBy(t => (t._1, t._2)), st)

  test("a purchase credits the latest strictly-preceding touch") {
    val (out, st) = fold(None,
      (10L, 1L, "view", 0L), (20L, 2L, "click", 0L),
      (30L, 3L, "purchase", 500L))
    assert(out === Seq(Attr(7, "click", 500)))
    // the purchase itself never becomes a touch
    assert(st === Some(Touch(20, 2, "click")))
  }

  test("no prior touch credits 'direct'; later touches don't backdate") {
    val (out, _) = fold(None,
      (10L, 1L, "purchase", 100L), (20L, 2L, "view", 0L),
      (30L, 3L, "purchase", 200L))
    assert(out === Seq(Attr(7, "direct", 100), Attr(7, "view", 200)))
  }

  test("equal timestamps order by event_id — the batch window tie rule") {
    val (out, _) = fold(None,
      (10L, 2L, "view", 0L), (10L, 5L, "purchase", 100L))
    assert(out === Seq(Attr(7, "view", 100)))
  }

  test("the cross-batch seam: touch in batch k, purchase in batch k+1") {
    val (o1, st1) = fold(None, (10L, 1L, "signup", 0L))
    assert(o1.isEmpty && st1 === Some(Touch(10, 1, "signup")))
    val (o2, st2) = fold(st1, (20L, 2L, "purchase", 300L))
    assert(o2 === Seq(Attr(7, "signup", 300)))
    assert(st2 === st1) // purchases never advance the touch
  }

  test("an empty batch leaves state untouched and emits nothing") {
    val st = Some(Touch(10, 1, "view"))
    assert(fold(st) === ((Seq.empty, st)))
  }
}

/** The drained incremental attribution equals the batch window form. */
class AttributionParitySpec extends SparkSpec {
  test("stream_attribution ≡ q_attribution on sf0.001") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("channel")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val streamed =
      rows(graft.SparkEntry.queries("stream_attribution")(spark, sfDir))
    val batch = rows(graft.SparkEntry.queries("q_attribution")(spark, sfDir))
    assert(streamed === batch)
  }
}
