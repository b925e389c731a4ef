package graft.streaming

import graft.operators.Drift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** q49's KS drift, LIVE: per tumbling window, each group's value
  * distribution is tested against the rest of that window's corpus, and
  * the per-window (group, n_grp, ks) lands in `onWindow` as soon as the
  * watermark finalizes the window — the alarm wire for "source X started
  * sending garbage at 14:00".
  *
  * The streaming aggregation emits exactly the (group, v, c) count shape
  * [[Drift.ksDriftFromCounts]] consumes, so batch and stream share the
  * statistic's implementation verbatim (the EventStream twin pattern).
  * State is bounded: one count row per (window, group, distinct value) —
  * the same low-cardinality contract as batch ksDrift — and append mode
  * drops it once the watermark passes.
  */
object DriftMonitor {

  def start(
      docs: DataFrame, tsCol: String, grpCol: String, valueCol: String,
      windowDuration: String, watermarkDelay: String,
      onWindow: (java.sql.Timestamp, DataFrame) => Unit): StreamingQuery =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        window(col(tsCol), windowDuration).as("w"),
        col(grpCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("window_start"), col(grpCol), col("v"), col("c"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // append mode: every row belongs to a freshly FINALIZED window;
        // the handful of windows per batch is a bounded driver loop
        batch.persist()
        try batch.select("window_start").distinct().collect()
          .map(_.getTimestamp(0)).sortBy(_.getTime).foreach { ws =>
            onWindow(ws, Drift.ksDriftFromCounts(
              batch.filter(col("window_start") === ws)
                .select(col(grpCol), col("v"), col("c")), grpCol))
          }
        finally batch.unpersist()
      }
      .start()
}
