package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heavy-tail taming for training-data pipelines. */
object Outliers {

  /** Per-group winsorization: clamp `valCol` into its OWN group's
    * [p(pLo), p(pHi)] percentile window — the cleaning primitive that
    * tames outliers without dropping rows (dropping biases a corpus;
    * clamping keeps the row and bounds its influence).
    *
    * Shape: one exact-percentile aggregation per group (tiny result,
    * auto-broadcast) + a map-side clamp — the corpus itself never
    * shuffles. Adds `<valCol>_w` (double). Bounds are rounded to 6 dp
    * BEFORE clamping: the interpolated percentile's last bits are the one
    * place engines may disagree, and rounding there makes the clamped
    * values — and anything summed from them — bit-reproducible.
    */
  def winsorize(
      df: DataFrame, grpCol: String, valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val bounds = df.groupBy(col(grpCol)).agg(
      round(percentile(col(valCol), lit(pLo)), 6).as("__lo"),
      round(percentile(col(valCol), lit(pHi)), 6).as("__hi"))
    df.join(broadcast(bounds), grpCol)
      .withColumn(s"${valCol}_w",
        least(greatest(col(valCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
