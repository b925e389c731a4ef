package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift statistics for corpus monitoring. */
object Drift {

  /** EXACT two-sample Kolmogorov–Smirnov statistic of each group's
    * `valueCol` distribution against the REST of the corpus:
    * KS(g) = max over x of |F_g(x) − F_rest(x)| — the alarm a
    * training-data pipeline raises when one source's length/quality
    * distribution walks away from the corpus (q37's percentile profile
    * compresses each group; this measures the actual distributional gap).
    *
    * Shape: one (group, value) count aggregation + a (groups × distinct
    * values) grid with windowed cumulative sums. The grid is the scale
    * contract — valueCol must be LOW-CARDINALITY (lengths, scores,
    * bucketed values), making the grid O(|groups| · |values|) ≪ corpus
    * size; for continuous values, bucket first. All arithmetic is integer
    * counts until the final division, so the statistic is exact and
    * engine-reproducible (rounded 6 dp).
    *
    * Returns (grpCol, n_grp, ks); a group that IS the whole corpus
    * reports ks = 0.
    */
  def ksDrift(
      docs: DataFrame, grpCol: String = "source",
      valueCol: String = "n_chars"): DataFrame =
    ksDriftFromCounts(
      docs
        .groupBy(col(grpCol), col(valueCol).as("v"))
        .agg(count(lit(1)).as("c")),
      grpCol)

  /** [[ksDrift]] from pre-aggregated (group, v, c) counts — the entry
    * point streaming shares: a windowed streaming aggregation emits
    * exactly this shape per finalized window (`streaming.DriftMonitor`),
    * and sketched/pre-bucketed pipelines can feed it directly.
    */
  def ksDriftFromCounts(counts: DataFrame, grpCol: String): DataFrame = {
    val grps = counts.groupBy(col(grpCol)).agg(sum(col("c")).as("n_grp"))
    val vals = counts.select(col("v")).distinct()
    val globalCounts = counts.groupBy(col("v")).agg(sum(col("c")).as("cg"))
    val total = counts.agg(sum(col("c")).as("n_total"))

    val grid = grps
      .crossJoin(vals)
      .join(counts, Seq(grpCol, "v"), "left")
      .na.fill(0L, Seq("c"))
      .join(globalCounts, Seq("v"))
      .crossJoin(broadcast(total))
    val w = Window.partitionBy(grpCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cumS", sum(col("c")).over(w))
      .withColumn("cumG", sum(col("cg")).over(w))
      .groupBy(col(grpCol), col("n_grp"))
      .agg(
        round(
          max(
            when(col("n_total") === col("n_grp"), lit(0.0))
              .otherwise(abs(
                col("cumS").cast("double") / col("n_grp")
                  - (col("cumG") - col("cumS")).cast("double")
                  / (col("n_total") - col("n_grp"))))), 6).as("ks"))
      .select(col(grpCol), col("n_grp"), col("ks"))
  }
}
