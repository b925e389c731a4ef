package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Structured-Streaming twin of the batch tumbling-window aggregate
  * (SURVEY §2 `streaming.EventStream`; q13's streaming twin).
  *
  * The reference processed "streams" as daily Airflow batches
  * (`tweets_and_market.py`); Spark-first that becomes `readStream` →
  * watermark → windowed agg, with the SAME column expressions as the batch
  * operator — one definition of the computation, two execution modes.
  *
  * Watermark semantics at scale: state for a 1-hour window is dropped once
  * the watermark (max event time − delay) passes the window end, so state
  * size is bounded by (delay / window) × |keys|, independent of stream
  * length.
  */
object EventStream {

  /** ts, event_type, value → windowed counts + value sums. Works on a
    * streaming OR batch DataFrame (the plan is identical; Catalyst adds
    * stateful operators only under `writeStream`).
    */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Stream–static enrichment: join live events against a static (slowly
    * changing) dimension, broadcast so each micro-batch is a map-side
    * hash join — no shuffle, no stream state. The streaming twin of the
    * reference's date-keyed analysis join (R14: markets ⋈ sentiment);
    * at scale the dimension is the small side by construction, and a
    * dimension refresh is a restart with a new snapshot (the standard
    * stream–static contract: the static side is read per micro-batch
    * plan, not checkpointed).
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Windowed approximate distinct users — q17's HLL sketch running live:
    * per tumbling window, `approx_count_distinct` keeps one mergeable HLL
    * per (window) in the state store instead of the exact formulation's
    * per-user state (unbounded key space). rsd 0.02 matches the batch
    * operator, so the streaming and batch estimates are identical on the
    * same finalized window.
    */
  def distinctUsers(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("window.start").as("window_start"), col("approx_users"))
  }

  /** Native `session_window` sessionization under a watermark — the
    * streaming run of the EXACT expression behind the batch operator
    * (`Relational.sessionWindowAgg`, q45). Complements
    * [[SessionState]] (the flatMapGroupsWithState formulation): this one
    * is declarative — the state store merges overlapping session windows
    * and emits a session once the watermark passes its end (last event +
    * gap), so state per user is bounded by the watermark delay.
    */
  def sessionCounts(
      events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
  }

  /** Stream–stream interval join: each purchase matched to the same
    * user's clicks in the `lookback` window before it (the attribution
    * join; q28's as-of shape made continuous). Expected schemas:
    * purchases(p_user, p_id, p_ts), clicks(c_user, c_id, c_ts).
    *
    * Both sides carry a watermark and the join predicate bounds c_ts to
    * [p_ts − lookback, p_ts], so each side's join state is dropped once
    * the other side's watermark passes the interval — state is
    * O(rate × (delay + lookback)) regardless of stream length. Without
    * the time bound Spark would (correctly) keep both streams' state
    * forever; the interval is what makes the operator runnable at scale.
    */
  def intervalJoin(
      purchases: DataFrame, clicks: DataFrame,
      lookback: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val p =
      if (purchases.isStreaming) purchases.withWatermark("p_ts", watermarkDelay)
      else purchases
    val c =
      if (clicks.isStreaming) clicks.withWatermark("c_ts", watermarkDelay) else clicks
    p.join(
        c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"interval $lookback") &&
          col("c_ts") <= col("p_ts"))
      .select(
        col("p_user").as("user_id"),
        col("p_id"), col("p_ts"), col("c_id"), col("c_ts"))
  }

  /** Streaming twin of q03's sentiment summary (the reference's daily
    * tweets-sentiment batch, `tweets.py:62-77`, as a live windowed stream):
    * ts + text → per-window tri-state sentiment counts, one wide row per
    * window. Uses the SAME lexicon expressions as the batch operator and a
    * pivot-free conditional aggregation (streaming does not support pivot).
    */
  def sentimentCounts(docs: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (docs.isStreaming) docs.withWatermark("ts", watermarkDelay) else docs
    val s = graft.functions.TextFunctions.overallSentiment(col("text"))
    withWm
      .groupBy(window(col("ts"), "1 day"))
      .agg(
        sum(when(s === "positive", 1L).otherwise(0L)).as("positive_count"),
        sum(when(s === "negative", 1L).otherwise(0L)).as("negative_count"),
        sum(when(s === "na", 1L).otherwise(0L)).as("na_count"))
      .select(
        col("window.start").as("window_start"),
        col("positive_count"), col("negative_count"), col("na_count"))
  }
}
