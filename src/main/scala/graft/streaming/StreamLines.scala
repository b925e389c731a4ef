package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q113 line dedup (SURVEY §2) — the split every
  * boilerplate filter runs in production: the boilerplate-line table is a
  * NIGHTLY BATCH artifact ([[graft.operators.Lines.boilerplateLines]],
  * persisted like the q65 band index — a line is only "boilerplate" as a
  * CORPUS property, which no single micro-batch can decide), and the live
  * half filters the crawl feed against it STATELESSLY, so chrome is
  * stripped as documents arrive instead of queueing for the next batch.
  *
  * [[clean]] is the [[StreamQualityGate]] shape: the artifact rides the
  * executors as ONE broadcast hash set (8 bytes per boilerplate line —
  * millions of lines fit comfortably; never a plan-literal array, the
  * classifier's MaxLiteralWeights lesson), line hashing is the exact
  * per-row expression chain the batch operator uses
  * (`xxhash64(normalized(line))`, whitespace-only lines structural), and
  * membership tests run through one Seq[Long]→Seq[Boolean] UDF per row.
  * NO shuffle, NO streaming state (spec asserts `stateOperators.isEmpty`),
  * append mode, scan bandwidth. Batch/stream parity is exact by
  * construction and spec-asserted row-for-row against
  * [[graft.operators.Lines.lineDedup]] on the finalized corpus.
  *
  * [[monitor]] is the [[StreamDedupStats]] observability half for this
  * filter: per (event-time window, source), the doc count, the count of
  * docs the doc-level escalation DROPS, and the mean removed fraction —
  * a source whose chrome share jumps is a template change or a crawler
  * trap NOW, not at the nightly rollup. A plain watermarked windowed
  * aggregation (built-in state, emits on finalize) — no custom state.
  */
object StreamLines {

  /** Filter a (possibly streaming) frame against the persisted
    * boilerplate set: every input column passes through, plus the q113
    * output columns (n_lines, n_removed, removed_frac, keep, text_clean).
    * Null-text rows drop (the batch contract).
    */
  def clean(
      stream: DataFrame, boiler: Array[Long],
      textCol: String = "text", maxRemovedFrac: Double = 0.3): DataFrame = {
    val spark = stream.sparkSession
    // broadcast a SORTED primitive array probed by binary search — an
    // immutable Set[Long] boxes every entry (~40-60 B each vs the
    // advertised 8 B/line): at the documented millions-of-lines scale
    // that is the difference between an 80 MB artifact and a
    // ~0.5-1 GB-per-executor one
    val sorted = boiler.clone()
    java.util.Arrays.sort(sorted)
    val bc = spark.sparkContext.broadcast(sorted)
    val mask = udf((hs: Seq[java.lang.Long]) =>
      hs.map(h => h != null &&
        java.util.Arrays.binarySearch(bc.value, h.longValue) >= 0))
    stream.filter(col(textCol).isNotNull)
      .withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("__lh", transform(col("__lines"),
        l => when(length(trim(l)) > 0, xxhash64(Dedup.normalized(l)))))
      .withColumn("__mask", mask(col("__lh")))
      .withColumn("__content", size(filter(col("__lh"), h => h.isNotNull)))
      .withColumn("__nrem",
        size(filter(col("__mask"), m => m)))
      .withColumn("n_lines", col("__content").cast("long"))
      .withColumn("n_removed", col("__nrem").cast("long"))
      .withColumn("removed_frac",
        round(when(col("__content") > 0,
          col("__nrem").cast("double") / col("__content")).otherwise(lit(0.0)), 4))
      .withColumn("keep",
        when(col("__content") > 0,
          col("__nrem").cast("double") / col("__content")).otherwise(lit(0.0))
          <= maxRemovedFrac)
      .withColumn("text_clean",
        array_join(
          zip_with(col("__lines"), col("__mask"),
            (l, m) => when(m, lit(null)).otherwise(l)),
          "\n"))
      .drop("__lines", "__lh", "__mask", "__content", "__nrem")
  }

  /** Per-(window, source) chrome observability over [[clean]]'s output:
    * (window_start, source, n_docs, n_dropped, avg_removed_frac). Emits
    * each window once on finalize (watermark-closed).
    */
  def monitor(
      cleaned: DataFrame, tsCol: String, srcCol: String,
      windowDur: String = "10 minutes", watermark: String = "10 minutes"): DataFrame =
    cleaned
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(srcCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
        round(avg(col("removed_frac")), 4).as("avg_removed_frac"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_docs"), col("n_dropped"), col("avg_removed_frac"))
}
