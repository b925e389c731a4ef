package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy-tail taming for training-data pipelines. */
object Outliers {

  /** Per-group winsorization: clamp `valCol` into its OWN group's
    * [p(pLo), p(pHi)] percentile window — the cleaning primitive that
    * tames outliers without dropping rows (dropping biases a corpus;
    * clamping keeps the row and bounds its influence).
    *
    * Shape: one percentile aggregation per group (tiny result,
    * auto-broadcast) + a map-side clamp — the corpus itself never
    * shuffles. Adds `<valCol>_w` (double). Bounds are rounded to 6 dp
    * BEFORE clamping: the interpolated percentile's last bits are the one
    * place engines may disagree, and rounding there makes the clamped
    * values — and anything summed from them — bit-reproducible.
    *
    * Cut computation has two paths:
    *  - `approxCuts = false` (default): Spark's exact `percentile`. Its
    *    aggregation buffer holds each group's distinct values — fine for
    *    bounded-cardinality columns, but on arbitrary unrounded doubles
    *    the buffer grows O(group size) and becomes the OOM point at a
    *    100× scale-up. This path is the ORACLE TWIN, not the scale path.
    *  - `approxCuts = true`: `approx_percentile` (Greenwald–Khanna), a
    *    one-pass MERGEABLE sketch with bounded state (O(accuracy) per
    *    group regardless of group size) — the path to run at 100 TB. The
    *    sketch's rank error is ≤ 1/accuracy; [[cutGate]] asserts in-query
    *    that its cuts land inside the exact cuts' quantile window, the
    *    same gated-sketch discipline as q37 (Relational.qualityPercentilesGate).
    */
  def winsorize(
      df: DataFrame, grpCol: String, valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95,
      approxCuts: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    def cut(p: Double): Column =
      if (approxCuts) approx_percentile(col(valCol), lit(p), lit(accuracy)).cast("double")
      else percentile(col(valCol), lit(p))
    val bounds = df.groupBy(col(grpCol)).agg(
      round(cut(pLo), 6).as("__lo"),
      round(cut(pHi), 6).as("__hi"))
    df.join(broadcast(bounds), grpCol)
      .withColumn(s"${valCol}_w",
        least(greatest(col(valCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** In-query gate for the `approxCuts` scale path: per group, the
    * `approx_percentile` cut at pLo/pHi must land inside the exact
    * [p−window, p+window] QUANTILE window (clamped to [0,1]). The window
    * is rank-based, not value-based, because the sketch's error contract
    * is on rank — and the sketch returns an element where exact
    * interpolates, so the window must also absorb one interpolation gap
    * (q37's reasoning; ±0.08 ≥ 2 ranks at 25-row groups). Output:
    * (grp, n, exact_lo, exact_hi, lo_ok, hi_ok) — exact values are the
    * oracle-checkable spine, the booleans assert the sketch.
    *
    * Edge behaviour: when `window > min(pLo, 1-pHi)` the window clamps to
    * quantile 0 (group min) or 1 (group max). Because the sketch returns
    * an actual group element, `sketch >= min` and `sketch <= max` hold
    * trivially, so the gate is ONE-SIDED at a clamped edge (only the
    * inward bound constrains). With the defaults (pLo=0.05, pHi=0.95,
    * window=0.08) both tails clamp — the same asymmetry q37 accepts with
    * its 0.91..1.0 window. Pass `window <= min(pLo, 1-pHi)` for a
    * genuinely two-sided gate.
    */
  def cutGate(
      df: DataFrame, grpCol: String, valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95,
      window: Double = 0.08, accuracy: Int = 10000): DataFrame = {
    require(0 < window && window < 0.5, "need 0 < window < 0.5")
    val b = Seq(
      math.max(pLo - window, 0), math.min(pLo + window, 1),
      math.max(pHi - window, 0), math.min(pHi + window, 1))
    df.groupBy(col(grpCol)).agg(
        count(lit(1)).as("n"),
        round(percentile(col(valCol), lit(pLo)), 4).as("exact_lo"),
        round(percentile(col(valCol), lit(pHi)), 4).as("exact_hi"),
        percentile(col(valCol), array(b.map(lit): _*)).as("__b"),
        approx_percentile(col(valCol), array(lit(pLo), lit(pHi)), lit(accuracy)).as("__sk"))
      .select(col(grpCol), col("n"), col("exact_lo"), col("exact_hi"),
        col("__sk").getItem(0).cast("double")
          .between(col("__b").getItem(0), col("__b").getItem(1)).as("lo_ok"),
        col("__sk").getItem(1).cast("double")
          .between(col("__b").getItem(2), col("__b").getItem(3)).as("hi_ok"))
  }
}
