package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One typed event on the wire (q97's input grain: the funnel needs the
  * event type; every type extends the session, only step types score).
  */
case class FunnelEvent(user_id: Long, event_id: Long, event_type: String, ts: Timestamp)

/** Open-session funnel state per user: session bounds plus, per funnel
  * step, the event times of that step seen so far (only [[StreamFunnel.Steps]]
  * types are recorded — state is O(step events per open session), the exact
  * price of order-correct funnels under out-of-order arrival; see scaladoc).
  */
case class OpenFunnel(startUs: Long, lastUs: Long, nEvents: Long, stepTimes: Seq[Seq[Long]])

/** A closed session with its funnel chain evaluated: `reached` = number of
  * steps completed IN ORDER (q97's conditional-min chain).
  */
case class FunnelSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long, reached: Int)

/** Structured-Streaming twin of the batch session funnel (q97;
  * `Funnel.sessionFunnel`) — gap sessions close by event-time timeout under
  * the watermark, and each closed session carries how far it progressed
  * through the ordered step chain.
  *
  * Exactness under out-of-order arrival: the chain t₀ = min(step₀),
  * tᵢ = min(stepᵢ ≥ tᵢ₋₁) cannot be folded incrementally — a late-but-
  * within-watermark earlier `view` can retroactively unlock an already-seen
  * `click` — so the state keeps each step's event times for the OPEN
  * session and evaluates the chain once, at close. That is O(step events
  * per open session) state, bounded in time by gap + watermark (sessions
  * close, state frees), vs [[SessionState]]'s O(1): the honest cost of
  * order-sensitive semantics, not a leak. Session boundaries themselves
  * fold exactly as in [[SessionState]] (same gap, max-merge).
  *
  * [[funnelRollup]] re-aggregates the closed-session stream to the batch
  * operator's exact output shape; StreamingSpec pins finalized equality
  * with `Funnel.sessionFunnel` on identical events, including an
  * out-of-order delivery.
  */
object StreamFunnel {

  val GapUs: Long = SessionState.GapUs
  val Steps: Seq[String] = Seq("view", "click", "purchase")

  private def us(t: Timestamp): Long = t.getTime * 1000L

  /** q97's conditional-min chain over the recorded step times: the number
    * of steps reached in order.
    */
  def chainReached(stepTimes: Seq[Seq[Long]]): Int = {
    var prev = Long.MinValue
    var i = 0
    while (i < stepTimes.size) {
      stepTimes(i).filter(_ >= prev).minOption match {
        case Some(t) => prev = t; i += 1
        case None => return i
      }
    }
    i
  }

  private def close(userId: Long, s: OpenFunnel): FunnelSession =
    FunnelSession(userId, s.startUs, s.lastUs, s.nEvents, chainReached(s.stepTimes))

  private def record(s: OpenFunnel, e: FunnelEvent): OpenFunnel = {
    val idx = Steps.indexOf(e.event_type)
    val times =
      if (idx < 0) s.stepTimes
      else s.stepTimes.updated(idx, s.stepTimes(idx) :+ us(e.ts))
    s.copy(
      lastUs = math.max(s.lastUs, us(e.ts)),
      nEvents = s.nEvents + 1,
      stepTimes = times)
  }

  private def fresh(e: FunnelEvent): OpenFunnel =
    record(OpenFunnel(us(e.ts), Long.MinValue, 0L, Steps.map(_ => Seq.empty[Long])), e)

  /** Per-group micro-batch handler: the [[SessionState]] fold with step
    * recording; emits a [[FunnelSession]] per gap-closed session and on
    * event-time timeout.
    */
  def updateFunnels(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[OpenFunnel]): Iterator[FunnelSession] = {
    if (events.isEmpty && state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _)).iterator
      state.remove()
      return out
    }

    val sorted = events.toSeq.sortBy(e => (us(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[FunnelSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if us(e.ts) - s.lastUs > GapUs =>
          closed += close(userId, s)
          open = Some(fresh(e))
        case Some(s) =>
          open = Some(record(s, e))
        case None =>
          open = Some(fresh(e))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastUs / 1000L + GapUs / 1000L)
    }
    closed.result().iterator
  }

  /** Wire the handler over a (possibly streaming) typed event Dataset. */
  def funnelize(spark: SparkSession, events: Dataset[FunnelEvent]): Dataset[FunnelSession] = {
    import spark.implicits._
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateFunnels)
  }

  /** Roll the closed-session stream up to the batch operator's output
    * shape: (step, event_type, n_sessions, n_reached, rate_from_start,
    * rate_from_prev) — `reached >= i+1` is exactly "session has t_i set".
    */
  def funnelRollup(closed: DataFrame, steps: Seq[String] = Steps): DataFrame = {
    val aggs = count(lit(1)).as("n_sessions") +:
      steps.indices.map(i =>
        count(when(col("reached") >= i + 1, lit(1))).as(s"r$i"))
    val reached = closed.agg(aggs.head, aggs.tail: _*)
    val stepRows = steps.zipWithIndex.map { case (name, i) =>
      struct(
        lit(i + 1).as("step"), lit(name).as("event_type"),
        col("n_sessions"), col(s"r$i").as("n_reached"),
        round(col(s"r$i").cast("double") / col("n_sessions"), 4)
          .as("rate_from_start"),
        round(col(s"r$i").cast("double")
          / (if (i == 0) col("n_sessions") else col(s"r${i - 1}")), 4)
          .as("rate_from_prev"))
    }
    reached.select(explode(array(stepRows: _*)).as("s")).select(col("s.*"))
  }
}
