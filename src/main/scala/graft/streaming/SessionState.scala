package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}

/** One event on the wire (subset of the events table). */
case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)

/** Open-session state kept per user between micro-batches. */
case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long)

/** A finalized session (q12's output shape). */
case class ClosedSession(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

/** Structured-Streaming twin of the batch gap-sessionization (SURVEY §2
  * `streaming.SessionState`; q12's streaming twin), via
  * `flatMapGroupsWithState` — the Spark-first replacement for the
  * reference's daily re-batch orchestration.
  *
  * State shape at scale: exactly one [[OpenSession]] per active user —
  * O(active users), not O(events) — and the event-time timeout closes idle
  * sessions as the watermark advances, so abandoned users don't leak state.
  */
object SessionState {

  val GapUs: Long = 30L * 60L * 1000000L // 30 min, same gap as the batch op

  private def us(t: Timestamp): Long = t.getTime * 1000L

  /** Per-group micro-batch handler: folds the batch's events (sorted by
    * event time) into the open session, emitting a [[ClosedSession]] every
    * time a gap exceeds [[GapUs]], and closes the remaining session on
    * event-time timeout.
    */
  def updateSessions(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (events.isEmpty && state.hasTimedOut) {
      val out = state.getOption
        .map(s => ClosedSession(userId, s.nEvents, s.startUs, s.lastUs)).iterator
      state.remove()
      return out
    }

    val sorted = events.toSeq.sortBy(e => (us(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val t = us(e.ts)
      open match {
        case Some(s) if t - s.lastUs > GapUs =>
          closed += ClosedSession(userId, s.nEvents, s.startUs, s.lastUs)
          open = Some(OpenSession(t, t, 1L))
        case Some(s) =>
          open = Some(s.copy(lastUs = math.max(s.lastUs, t), nEvents = s.nEvents + 1))
        case None =>
          open = Some(OpenSession(t, t, 1L))
      }
    }
    open.foreach { s =>
      state.update(s)
      // Close the session once event time passes lastUs + gap.
      state.setTimeoutTimestamp(s.lastUs / 1000L + GapUs / 1000L)
    }
    closed.result().iterator
  }

  /** Wire the handler over a (possibly streaming) typed event Dataset.
    * Requires a watermark on `ts` when streaming (for the event-time
    * timeout); output mode Append.
    */
  def sessionize(spark: SparkSession, events: Dataset[SessionEvent]): Dataset[ClosedSession] = {
    import spark.implicits._
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateSessions)
  }
}
