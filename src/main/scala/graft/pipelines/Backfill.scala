package graft.pipelines

import java.time.LocalDate

import graft.sources.JsonlGz
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-day backfill over [[DailyPipeline]] — the reference DAG's
  * operational semantics (per-execution-date idempotent runs, retries,
  * quality gate, `tweets_and_market.py`) as a library call, for the first
  * thing an operator does after an outage: re-run a date range.
  *
  * Per day: dead-letter the unparseable input lines, run the day's
  * pipeline, gate on the summary actually containing rows, retry
  * transient failures, and record an outcome — a bad day is quarantined
  * and REPORTED, never silently skipped, and never aborts the rest of the
  * range (the reference's `depends_on_past=False` behavior).
  *
  * Idempotent by construction: every day writes to deterministic per-day
  * paths in overwrite mode (staged summary, quarantine), so re-running a
  * range converges to the same outputs with no duplicates — the property
  * Airflow's execution-date model gives the reference.
  *
  * Scale notes: the driver loop is per-DAY orchestration (bounded,
  * sequential, like the scheduler it replaces); all per-ROW work stays in
  * Spark jobs. Each outcome collects one summary row — O(days) driver
  * memory.
  */
object Backfill {

  /** One execution date's result. `ok=false` days carry why: a thrown
    * error (after `retries+1` attempts) or a failed quality gate; their
    * corrupt input, if any, is at `quarantinePath`.
    */
  case class DayOutcome(
      date: LocalDate,
      ok: Boolean,
      attempts: Int,
      summaryRows: Long,
      corruptLines: Long,
      quarantinePath: Option[String],
      error: Option[String])

  /** Backfill `[start, endInclusive]`. `minRows` is the quality gate on
    * the day's summarized tweet count (the reference gates `count(*) > 0`
    * after each daily load, `tweets.py:136-142`).
    */
  def run(
      spark: SparkSession,
      inputRoot: String, outputRoot: String,
      start: LocalDate, endInclusive: LocalDate,
      language: String = "en",
      retries: Int = 1, minRows: Long = 1): Seq[DayOutcome] = {
    require(!endInclusive.isBefore(start), s"empty range $start..$endInclusive")
    Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(!_.isAfter(endInclusive))
      .map(d => runDay(spark, inputRoot, outputRoot, d, language, retries, minRows))
      .toSeq
  }

  private def runDay(
      spark: SparkSession,
      inputRoot: String, outputRoot: String,
      date: LocalDate, language: String,
      retries: Int, minRows: Long): DayOutcome = {
    val (y, m, d) = (date.getYear, date.getMonthValue, date.getDayOfMonth)
    var attempt = 0
    var last: DayOutcome = null
    var retryable = true
    while (attempt <= retries && (last == null || (!last.ok && retryable))) {
      attempt += 1
      retryable = false
      last =
        try {
          // Dead-letter the unparseable lines before the pipeline consumes
          // the clean ones (same single-pass parse, two filtered writes).
          val inPath = f"$inputRoot/$y%04d/$m%02d/$d%02d/*.jsonl.gz"
          val raw = JsonlGz.read(spark, inPath, DailyPipeline.InputSchema)
          val corrupt = JsonlGz.corrupt(raw).cache()
          val nCorrupt = corrupt.count()
          val qPath =
            if (nCorrupt == 0) None
            else {
              val p = f"$outputRoot/quarantine/$y%04d-$m%02d-$d%02d"
              JsonlGz.write(corrupt, p)
              Some(p)
            }
          corrupt.unpersist()

          val run = DailyPipeline.processDay(spark, inputRoot, outputRoot, y, m, d, language)
          // the gate: how many tweets the day actually summarized
          val row = run.summary
            .select((col("positive_count") + col("negative_count") + col("na_count"))
              .cast("long").as("n"))
            .collect()
          val n = if (row.isEmpty) 0L else row(0).getLong(0)
          if (n >= minRows)
            DayOutcome(date, ok = true, attempt, n, nCorrupt, qPath, None)
          else
            // deterministic outcome (the data IS below the gate) — no retry
            DayOutcome(date, ok = false, attempt, n, nCorrupt, qPath,
              Some(s"quality gate: $n summarized rows < $minRows"))
        } catch {
          case e: Exception =>
            retryable = true // thrown = possibly transient (missing mount, OOM)
            DayOutcome(date, ok = false, attempt, 0L, 0L, None,
              Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
    }
    last
  }
}
