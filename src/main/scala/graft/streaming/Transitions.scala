package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Incremental Markov transitions: q_markov's streaming twin via
 * `flatMapGroupsWithState` — per-user successor pairs under the TOTAL
 * (ts, event_id) order, emitted continuously as events arrive.
 *
 * State per user is its SINGLE most-recent event (ts, event_id, type) —
 * O(users), independent of stream length. Each micro-batch sorts its
 * per-user slice by (ts, event_id) (the [[Sessionize]]/[[Funnel]]
 * idiom); consecutive pairs across the carried state and the sorted
 * slice are exactly the batch lead() pairs under the in-order batch
 * contract, and each pair is final once emitted (Append mode exact).
 */
object Transitions {

  case class Ev(user_id: Long, ts: Long, event_id: Long, event_type: String)
  case class Last(ts: Long, event_id: Long, tpe: String)
  case class Edge(user_id: Long, src: String, dst: String)

  /** Fold one user's new events (sorted by (ts, event_id)) against the
    * carried last event, emitting one edge per consecutive pair. Pure —
    * shared by the streaming operator and TransitionsSpec. */
  def foldUser(user: Long, sorted: Seq[(Long, Long, String)],
               st: Option[Last]): (Seq[Edge], Option[Last]) = {
    var last = st
    val out = Seq.newBuilder[Edge]
    sorted.foreach { case (ts, id, tpe) =>
      last.foreach(l => out += Edge(user, l.tpe, tpe))
      last = Some(Last(ts, id, tpe))
    }
    (out.result(), last)
  }

  /** Streaming operator over a stream of Ev: emits (user, src, dst)
    * per observed transition. */
  def edges(events: Dataset[Ev]): Dataset[Edge] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Last, Edge](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Last]) =>
          val sorted = evs.map(e => (e.ts, e.event_id, e.event_type))
            .toSeq.sortBy(t => (t._1, t._2))
          val (out, next) = foldUser(user, sorted, state.getOption)
          next.foreach(state.update)
          out.iterator
      }
  }

  /** Driver entry plumbing: events file stream → drained edges →
    * batch-side |types²| transition counts + row-normalized
    * probabilities (identical post-processing, identical oracle to
    * q_markov). */
  def transitionCounts(spark: SparkSession, sfDir: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val src = StreamOps.fileSource(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev]
    val c = StreamOps.drainAppend(spark, edges(src).toDF())
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("src")).agg(sum(col("n")).as("tot"))
    c.join(tot, "src")
      .select(col("src"), col("dst"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
  }
}
