package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.Funnel._

/** Funnel fold semantics (pure) + incremental-equals-batch parity. */
class FunnelSpec extends AnyFunSuite {

  private def hits(evs: (Long, String)*): Seq[StageHit] =
    foldUser(7L, evs.sortBy(_._1), None)._1

  test("in-order view → click → purchase completes all three stages") {
    assert(hits((10L, "view"), (20L, "click"), (30L, "purchase")) ===
      Seq(StageHit(7, 1, 10), StageHit(7, 2, 20), StageHit(7, 3, 30)))
  }

  test("stages out of sequence do not count") {
    // click before any view; purchase before any click
    assert(hits((10L, "click"), (20L, "view"), (30L, "purchase")) ===
      Seq(StageHit(7, 1, 20)))
  }

  test("strict ordering: a click AT the first view's timestamp is excluded") {
    assert(hits((10L, "view"), (10L, "click")) === Seq(StageHit(7, 1, 10)))
    // a later click still qualifies
    assert(hits((10L, "view"), (10L, "click"), (11L, "click")) ===
      Seq(StageHit(7, 1, 10), StageHit(7, 2, 11)))
  }

  test("the FIRST qualifying event per stage wins; later ones emit nothing") {
    assert(hits((10L, "view"), (12L, "view"), (20L, "click"), (25L, "click")) ===
      Seq(StageHit(7, 1, 10), StageHit(7, 2, 20)))
  }

  test("state carries across batches (time-ordered batch contract)") {
    val (h1, st1) = foldUser(7L, Seq((10L, "view")), None)
    assert(h1 === Seq(StageHit(7, 1, 10)) && st1 === Stages(10, 0, 0))
    val (h2, st2) = foldUser(7L, Seq((20L, "click"), (30L, "purchase")), Some(st1))
    assert(h2 === Seq(StageHit(7, 2, 20), StageHit(7, 3, 30)))
    assert(st2 === Stages(10, 20, 30))
    // a completed stage never re-emits
    val (h3, _) = foldUser(7L, Seq((40L, "click")), Some(st2))
    assert(h3.isEmpty)
  }

  test("other event types pass through without touching state") {
    assert(hits((5L, "signup"), (10L, "view"), (15L, "error"), (20L, "click")) ===
      Seq(StageHit(7, 1, 10), StageHit(7, 2, 20)))
  }
}

/** The drained incremental funnel equals the batch q_funnel exactly. */
class FunnelParitySpec extends SparkSpec {
  test("stream_funnel ≡ q_funnel on sf0.001") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("stage")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val streamed = rows(Funnel.funnelCounts(spark, sfDir)
      .select(col("stage"), col("n_users")))
    val batch = rows(graft.SparkEntry.queries("q_funnel")(spark, sfDir)
      .select(col("stage"), col("n_users")))
    assert(streamed === batch)
  }
}
