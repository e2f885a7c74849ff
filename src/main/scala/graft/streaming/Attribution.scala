package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Real-time last-touch attribution: q_attribution's streaming twin via
 * `flatMapGroupsWithState` — every purchase is credited to the user's
 * most recent PRECEDING non-purchase event the moment it arrives, not
 * in a nightly batch window pass.
 *
 * State per user is ONE carried touch (ts, event_id, type) — O(users),
 * independent of stream length (the [[Transitions]] state shape). Each
 * micro-batch folds its per-user slice in (ts, event_id) order; a
 * purchase emits exactly once with the channel current AT THAT POINT
 * of the fold (the strict-past semantics of the batch window), and
 * non-purchase events advance the carried touch. Under the in-order
 * batch contract every emission is final — Append mode is exact, and
 * the cross-batch seam (touch in batch k, purchase in batch k+1)
 * resolves through the carried state.
 */
object Attribution {

  case class Ev(user_id: Long, ts: Long, event_id: Long,
                event_type: String, cents: Long)
  case class Touch(ts: Long, event_id: Long, tpe: String)
  case class Attr(user_id: Long, channel: String, cents: Long)

  /** Fold one user's new events (sorted by (ts, event_id)) against the
    * carried last touch. Pure — shared by the streaming operator and
    * AttributionSpec. */
  def foldUser(user: Long, sorted: Seq[(Long, Long, String, Long)],
               st: Option[Touch]): (Seq[Attr], Option[Touch]) = {
    var touch = st
    val out = Seq.newBuilder[Attr]
    sorted.foreach { case (ts, id, tpe, cents) =>
      if (tpe == "purchase")
        out += Attr(user, touch.map(_.tpe).getOrElse("direct"), cents)
      else touch = Some(Touch(ts, id, tpe))
    }
    (out.result(), touch)
  }

  /** Streaming operator: one Attr per purchase, credited live. */
  def attributions(events: Dataset[Ev]): Dataset[Attr] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Touch, Attr](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Touch]) =>
          val sorted = evs.map(e => (e.ts, e.event_id, e.event_type, e.cents))
            .toSeq.sortBy(t => (t._1, t._2))
          val (out, next) = foldUser(user, sorted, state.getOption)
          next.foreach(state.update)
          out.iterator
      }
  }

  /** Driver plumbing: events file stream → drained attributions →
    * batch-side per-channel rollup (identical oracle to
    * q_attribution). */
  def channelRevenue(spark: SparkSession, sfDir: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val src = StreamOps.fileSource(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[Ev]
    StreamOps.drainAppend(spark, attributions(src).toDF())
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
           (sum(col("cents")) / 100.0).as("revenue"))
  }
}
