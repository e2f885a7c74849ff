package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom stateful streaming: per-user session windows over the event
 * stream via `flatMapGroupsWithState` — the Spark-native form of
 * arbitrary keyed state (the capability class the built-in window
 * aggregation cannot express: session boundaries depend on the gap
 * between consecutive events, not on wall-clock buckets).
 *
 * A session closes when `gapNs` elapses between consecutive events of the
 * same user; closed sessions are emitted with their span and event count.
 * State per key is one open session (start, last, count) — O(users)
 * state, independent of stream length.
 */
object Sessionize {

  case class Ev(user_id: Long, ts: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
                     n_events: Long)

  val DefaultGapNs: Long = 30L * 60 * 1000 * 1000 * 1000 // 30 min

  /** Fold one user's new events into the open-session state, emitting
    * every session that the new events close. Pure — shared by the
    * streaming operator and the batch parity check. */
  def foldUser(user: Long, sorted: Seq[Long], st: Option[SessionState],
               gapNs: Long): (Seq[Session], Option[SessionState]) = {
    var state = st
    val out = Seq.newBuilder[Session]
    sorted.foreach { t =>
      state match {
        case Some(s) if t - s.last <= gapNs =>
          state = Some(s.copy(last = t, n = s.n + 1))
        case Some(s) =>
          out += Session(user, s.start, s.last, s.n)
          state = Some(SessionState(t, t, 1))
        case None =>
          state = Some(SessionState(t, t, 1))
      }
    }
    (out.result(), state)
  }

  /** Streaming operator over a stream of Ev. Emits closed sessions. */
  def sessions(events: Dataset[Ev], gapNs: Long = DefaultGapNs): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.map(_.ts).toSeq.sorted
          val (closed, next) =
            foldUser(user, sorted, state.getOption, gapNs)
          next match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          closed.iterator
      }
  }

  /**
   * Incremental sessionization over the events FILE stream (driver entry
   * `stream_sessionize`): the [[sessions]] operator on a readStream
   * source, µs-truncated timestamps for oracle parity. Append mode emits
   * a session only when a LATER event of the same user closes it, so the
   * result is exactly the batch sessionization minus each user's final
   * (still-open) session — which is what the SQL oracle computes.
   */
  def sessionsStream(spark: SparkSession, sfDir: String,
                     gapNs: Long = DefaultGapNs): Dataset[Session] = {
    import spark.implicits._
    val src = StreamOps.fileSource(spark, sfDir, "events")
      .select(col("user_id"), expr("(ts div 1000) * 1000").as("ts"))
      .as[Ev]
    sessions(src, gapNs)
  }

  /** Batch twin: the same sessionization computed declaratively — gap
    * flags via lag(), session ids via a running sum — for parity checks
    * and for running the operator over the batch table. One shuffle on
    * user_id; both windows share the partitioning. */
  def sessionsBatch(spark: SparkSession, sfDir: String,
                    gapNs: Long = DefaultGapNs,
                    microsPrecision: Boolean = false): Dataset[Session] = {
    import spark.implicits._
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    // microsPrecision matches engines that coerce TIMESTAMP_NS to µs
    // (DuckDB's epoch_ns on read_parquet) — truncation happens BEFORE
    // sessionization in both engines, so boundaries agree exactly.
    val tsCol = if (microsPrecision) expr("(ts div 1000) * 1000") else col("ts")
    graft.queries.Tables(spark, sfDir, "events")
      .select(col("user_id"), tsCol.as("ts"))
      .withColumn("_new", when(
        col("ts") - lag(col("ts"), 1).over(byUser) > gapNs, 1).otherwise(0))
      .withColumn("_sid", sum(col("_new")).over(byUser))
      .groupBy(col("user_id"), col("_sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
              col("n_events"))
      .as[Session]
  }
}
