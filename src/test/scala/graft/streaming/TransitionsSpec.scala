package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.Transitions._

/** Transition fold semantics (pure) + incremental-equals-batch parity. */
class TransitionsSpec extends AnyFunSuite {

  private def fold(st: Option[Last], evs: (Long, Long, String)*) =
    foldUser(7L, evs.sortBy(t => (t._1, t._2)), st)

  test("consecutive pairs in (ts, event_id) order become edges") {
    val (out, last) = fold(None,
      (10L, 1L, "view"), (20L, 2L, "click"), (30L, 3L, "purchase"))
    assert(out === Seq(Edge(7, "view", "click"), Edge(7, "click", "purchase")))
    assert(last === Some(Last(30, 3, "purchase")))
  }

  test("equal timestamps order by event_id — the batch lead() tie rule") {
    val (out, _) = fold(None, (10L, 5L, "b"), (10L, 2L, "a"), (10L, 9L, "c"))
    assert(out === Seq(Edge(7, "a", "b"), Edge(7, "b", "c")))
  }

  test("state carries across batches: the seam pair emits exactly once") {
    val (o1, st1) = fold(None, (10L, 1L, "view"))
    assert(o1.isEmpty && st1 === Some(Last(10, 1, "view")))
    val (o2, st2) = fold(st1, (20L, 2L, "click"), (30L, 3L, "view"))
    assert(o2 === Seq(Edge(7, "view", "click"), Edge(7, "click", "view")))
    assert(st2 === Some(Last(30, 3, "view")))
  }

  test("an empty batch leaves state untouched and emits nothing") {
    val st = Some(Last(10, 1, "view"))
    assert(fold(st) === ((Seq.empty, st)))
  }
}

/** The drained incremental transitions equal batch q_markov exactly. */
class TransitionsParitySpec extends SparkSpec {
  test("stream_markov ≡ q_markov on sf0.001") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("src"), col("dst")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
    val streamed = rows(graft.SparkEntry.queries("stream_markov")(spark, sfDir))
    val batch = rows(graft.SparkEntry.queries("q_markov")(spark, sfDir))
    assert(streamed === batch)
  }
}
