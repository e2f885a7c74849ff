package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Incremental ordered-funnel tracking: q_funnel's streaming twin via
 * `flatMapGroupsWithState` — per-user stage progression (view → click →
 * purchase, each strictly after the previous stage's FIRST completion)
 * maintained continuously as events arrive.
 *
 * State per user is three longs (the stage completion times; 0 = not yet
 * reached) — O(users), independent of stream length. Each micro-batch
 * sorts only that batch's per-user slice by event time (the Sessionize
 * idiom); within sorted order a stage, once set, is FINAL — its first
 * completion can never move earlier — so every emission is an immutable
 * fact and Append output mode is exact.
 *
 * Ordering contract (same as [[Sessionize]]): batches must arrive in
 * non-decreasing event-time ranges (a replayed log, a time-partitioned
 * ingestion feed). A cross-batch straggler BEHIND a set stage time could
 * in principle re-open an earlier completion; within that contract the
 * incremental result equals the batch funnel exactly.
 */
object Funnel {

  case class Ev(user_id: Long, ts: Long, event_type: String)
  case class Stages(t1: Long, t2: Long, t3: Long)
  case class StageHit(user_id: Long, stage: Long, ts: Long)

  /** Fold one user's new events (sorted by ts ascending) into the stage
    * state, emitting each stage the batch completes. Pure — shared by the
    * streaming operator and FunnelSpec's batch-parity check.
    *
    * Strict `>` against the PRIOR stage's time mirrors q_funnel's
    * `ts > t1` join conditions; equal-timestamp ties are excluded by the
    * strictness itself, so tie ORDER within the sort is irrelevant. */
  def foldUser(user: Long, sorted: Seq[(Long, String)],
               st: Option[Stages]): (Seq[StageHit], Stages) = {
    var Stages(t1, t2, t3) = st.getOrElse(Stages(0L, 0L, 0L))
    val out = Seq.newBuilder[StageHit]
    sorted.foreach { case (ts, tpe) =>
      tpe match {
        case "view" if t1 == 0L =>
          t1 = ts; out += StageHit(user, 1L, ts)
        case "click" if t2 == 0L && t1 != 0L && ts > t1 =>
          t2 = ts; out += StageHit(user, 2L, ts)
        case "purchase" if t3 == 0L && t2 != 0L && ts > t2 =>
          t3 = ts; out += StageHit(user, 3L, ts)
        case _ => // stage already reached, out of sequence, or other type
      }
    }
    (out.result(), Stages(t1, t2, t3))
  }

  /** Streaming operator over a stream of Ev: emits (user, stage, ts)
    * once per stage completion. */
  def stageHits(events: Dataset[Ev]): Dataset[StageHit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Stages, StageHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Stages]) =>
          val sorted = evs.map(e => (e.ts, e.event_type)).toSeq.sortBy(_._1)
          val (hits, next) = foldUser(user, sorted, state.getOption)
          state.update(next)
          hits.iterator
      }
  }

  /** Driver entry plumbing: the events file stream → per-stage user
    * counts. The stage-hit stream drains in append mode; the 3-row count
    * rollup runs batch-side over the drained hits (the stream_quantile
    * post-processing pattern) — same output, same oracle as q_funnel. */
  def funnelCounts(spark: SparkSession, sfDir: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val src = StreamOps.fileSource(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[Ev]
    StreamOps.drainAppend(spark, stageHits(src).toDF())
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
  }
}
