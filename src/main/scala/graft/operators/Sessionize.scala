package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an event stream — the classic stateful
  * operator a training-data/behavioral pipeline needs beyond the
  * reference's tumbling windows.
  *
  * Two realizations:
  *  - [[sessions]]: batch, via window functions — lag to detect gaps, a
  *    running sum of gap flags to number sessions. One shuffle on the key,
  *    sort within partitions; scales as long as a single key's history fits
  *    a partition (same bound as any per-key window).
  *  - [[streamingSessions]]: incremental, via flatMapGroupsWithState —
  *    bounded state per key (just the open session), event-time timeout
  *    closes sessions when the gap elapses.
  */
object Sessionize {

  /** Batch sessionization: assign session ids and aggregate per session.
    * Output: key, session_seq (1-based per key), session_start,
    * session_end, n_events. */
  def sessions(events: DataFrame, key: String, ts: String,
               gap: java.time.Duration): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts))
    val gapUs = gap.toMillis * 1000L
    val flagged = events
      .withColumn("_prev", lag(col(ts), 1).over(byKey))
      .withColumn("_new_session",
        (col("_prev").isNull ||
          unix_micros(col(ts)) - unix_micros(col("_prev")) > gapUs).cast("int"))
      .withColumn("session_seq",
        sum(col("_new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col(key), col("session_seq"))
      .agg(min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  final case class SessionEvent(key: Long, ts: Timestamp)
  final case class OpenSession(start: Long, end: Long, n: Long)
  final case class SessionOut(key: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long)

  /** Streaming sessionization with explicit state: one [[OpenSession]] per
    * key; a session is emitted when a new event arrives past the gap or the
    * event-time timeout fires. State size is O(active keys), independent of
    * history length. */
  def streamingSessions(events: Dataset[SessionEvent], gap: java.time.Duration)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gap.toMillis

    def update(key: Long, rows: Iterator[SessionEvent],
               state: GroupState[OpenSession]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(key, new Timestamp(s.start), new Timestamp(s.end), s.n))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          val t = e.ts.getTime
          open match {
            case Some(s) if t - s.end <= gapMs =>
              open = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
            case Some(s) =>
              closed += SessionOut(key, new Timestamp(s.start), new Timestamp(s.end), s.n)
              open = Some(OpenSession(t, t, 1))
            case None =>
              open = Some(OpenSession(t, t, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", s"${gap.toSeconds * 2} seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
