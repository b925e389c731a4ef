package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session FUNNEL analysis (SURVEY §2 q97) — the product-analytics staple
  * over the events stream: within each q12-defined session (same gap
  * semantics, kept at the EVENT grain), how many sessions progress
  * view → click → purchase IN ORDER? A step counts only if it happens at
  * or after the previous step's first occurrence — presence alone is not
  * conversion (a purchase before the first view is not a funnel pass),
  * which is why each step is the conditional min-timestamp of its type
  * bounded below by the previous step's time.
  *
  * Shape: the session labeling is one windowed pass (q12's lag/cumsum,
  * one (user) Exchange); each funnel step is then a conditional
  * aggregation over the SAME (user, session) key, so Catalyst reuses the
  * partitioning across the step joins rather than re-shuffling; the final
  * rollup is |steps| rows. Rates are integer-count divisions rounded 4 dp.
  *
  * Returns (step int, event_type, n_sessions, n_reached, rate_from_start,
  * rate_from_prev), one row per funnel step.
  */
object Funnel {

  def sessionFunnel(
      events: DataFrame, gapMinutes: Int = 30,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val labeled = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(wRows))
      .select(col("user_id"), col("session_seq"), col("event_type"), col("us"))
      .localCheckpoint()

    // t0 = first view; t_i = first step_i at or after t_{i-1}
    var cur = labeled
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(when(col("event_type") === steps.head, col("us"))).as("t0"))
    for (i <- 1 until steps.size) {
      val carry = (0 until i).map(j => min(col(s"t$j")).as(s"t$j"))
      val step = min(when(
        col("event_type") === steps(i) && col("us") >= col(s"t${i - 1}"),
        col("us"))).as(s"t$i")
      cur = labeled
        .join(cur, Seq("user_id", "session_seq"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(carry.head, (carry.tail :+ step): _*)
    }

    val aggs = count(lit(1)).as("n_sessions") +:
      steps.indices.map(i => count(col(s"t$i")).as(s"r$i"))
    val reached = cur.agg(aggs.head, aggs.tail: _*)

    // one row in, |steps| rows out — a per-row explode, not a self-union
    // (a union would re-run the whole funnel once per step)
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

  /** q98: RETENTION COHORTS — the other product-analytics staple: cohort =
    * a user's first active DAY; for every (cohort, day offset), how many
    * of that cohort's users were active? Shape: the event stream first
    * collapses to DISTINCT (user, day) — one shuffle, and the only
    * corpus-sized one; the first-day aggregation reuses the same user
    * partitioning; cohort sizes are a days-sized table that BROADCASTS
    * into the rate join. Output is |days|² rows max. Retention rates are
    * integer-count divisions rounded 4 dp.
    *
    * Returns (cohort_date, day_offset, n_users, cohort_size, retention).
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .localCheckpoint()
    val firstDay = ud.groupBy(col("user_id")).agg(min(col("d")).as("cohort_date"))
    val sizes = firstDay.groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("cohort_size"))
    ud.join(firstDay, "user_id")
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).cast("int").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .join(broadcast(sizes), "cohort_date")
      .select(col("cohort_date"), col("day_offset"), col("n_users"),
        col("cohort_size"),
        round(col("n_users").cast("double") / col("cohort_size"), 4)
          .as("retention"))
  }
}
