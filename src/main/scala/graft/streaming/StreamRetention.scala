package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One activity event on the wire (q98's input grain). */
case class RetentionEvent(user_id: Long, ts: Timestamp)

/** Per-user retention state: the cohort day (first active UTC day ever
  * seen) and the set of active days already emitted.
  */
case class UserDays(cohortDay: Int, seen: Seq[Int])

/** One first-activity increment: user was active on cohortDay + offset,
  * emitted exactly once per (user, day).
  */
case class RetentionHit(user_id: Long, cohort_day: Int, day_offset: Int)

/** Structured-Streaming twin of the batch retention cohorts (q98;
  * `Funnel.retentionCohorts`): per user, the first active day is the
  * cohort, and each newly-seen active day emits ONE (user, day_offset)
  * increment — [[rollup]] turns the increment stream into the batch
  * operator's exact output shape whenever it is read.
  *
  * State is the product here, not a window: a user's cohort must persist
  * for as long as retention is measured, so there is NO state timeout —
  * state is O(users × distinct active days seen), exactly the
  * information any engine needs to dedupe (user, day) activity. The
  * watermark only drops beyond-horizon stragglers before they reach the
  * state store. Re-delivered or same-day events fold to nothing
  * (the `seen` set), so increments are exactly-once per (user, day) by
  * construction.
  *
  * One subtlety the batch twin does not have: a LATE-but-in-watermark
  * event can predate the user's current cohort day (the true first day
  * arrives after a later day was already processed). The handler then
  * RE-BASES: it emits the new earlier day as offset 0 increments... but
  * already-emitted offsets cannot be retracted in Append mode, so
  * re-based users would double-count. The honest Append-mode contract is
  * the one implemented: the cohort is the first day SEEN BY THE STREAM,
  * and any later delivery of an EARLIER day is DROPPED (emitting it
  * would produce a negative day_offset — a row the batch twin can never
  * produce, silently breaking rollup-vs-batch equality). Within the
  * watermark's disorder window, order-of-arrival defines the cohort —
  * documented, deterministic for a given delivery; the spec pins both
  * the drop and the cross-batch cohort choice.
  */
object StreamRetention {

  private def epochDay(t: Timestamp): Int = Math.floorDiv(t.getTime, 86400000L).toInt

  def updateUser(
      userId: Long,
      events: Iterator[RetentionEvent],
      state: GroupState[UserDays]): Iterator[RetentionHit] = {
    if (events.isEmpty) return Iterator.empty
    val days = events.map(e => epochDay(e.ts)).toSeq.sorted.distinct
    var st = state.getOption.getOrElse(UserDays(days.head, Seq.empty))
    val out = Seq.newBuilder[RetentionHit]
    days.foreach { d =>
      // d < cohortDay: a late delivery of a day earlier than the
      // stream-seen cohort — dropped (see the Append-mode contract above);
      // emitting would yield a negative offset the batch twin cannot have.
      if (d >= st.cohortDay && !st.seen.contains(d)) {
        st = st.copy(seen = st.seen :+ d)
        out += RetentionHit(userId, st.cohortDay, d - st.cohortDay)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire the handler over a (possibly streaming) typed event Dataset. */
  def hits(spark: SparkSession, events: Dataset[RetentionEvent]): Dataset[RetentionHit] = {
    import spark.implicits._
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateUser)
  }

  /** Roll the increment stream up to the batch operator's exact shape:
    * (cohort_date, day_offset, n_users, cohort_size, retention).
    * Increments are unique per (user, day) so plain counts suffice; the
    * cohort size is the offset-0 count (every user emits offset 0 on its
    * first event).
    */
  def rollup(hits: DataFrame): DataFrame = {
    // the sizes side re-reads the same frame: rename its grouping key so
    // the self-join's outputs don't share attribute ids (the broadcast
    // hint otherwise trips conflicting-reference resolution)
    val sizes = hits.filter(col("day_offset") === 0)
      .groupBy(col("cohort_day").as("size_day"))
      .agg(count(lit(1)).as("cohort_size"))
    hits.groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .join(broadcast(sizes), col("cohort_day") === col("size_day"))
      .select(
        date_from_unix_date(col("cohort_day")).as("cohort_date"),
        col("day_offset").cast("int").as("day_offset"),
        col("n_users"), col("cohort_size"),
        round(col("n_users").cast("double") / col("cohort_size"), 4)
          .as("retention"))
  }
}
