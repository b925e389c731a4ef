package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-aggregated sketch tables — the pattern that answers "distinct users
  * for ANY date range / group slice" at 100 TB without rescanning events:
  * build one mergeable HLL sketch per (group, day) ONCE (a fact-table-sized
  * job), persist the few-KB binaries, and answer every later query by
  * unioning sketches (a sketch-table-sized job, ~10^6× smaller input).
  * Works because HLL union is register-wise max: merging per-day sketches
  * is the SAME operation the direct build performs, so rollups lose
  * nothing vs sketching the raw slice.
  *
  * Uses Spark's native DataSketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`) — codegen'd, mergeable,
  * persistable as a parquet binary column.
  */
object SketchRollup {

  /** The persistable sketch table: one (group, unit, sketch, n_rows) row
    * per group × time unit. `unit` is any derivable bucket (day, hour).
    */
  def sketches(
      df: DataFrame, groupCol: String, unit: Column, keyCol: String): DataFrame =
    df.groupBy(col(groupCol), unit.as("unit"))
      .agg(hll_sketch_agg(col(keyCol)).as("sketch"), count(lit(1)).as("n_rows"))

  /** Roll a sketch table up to per-group estimates (optionally after the
    * caller filters `unit` to the range of interest).
    */
  def rollup(sketchTable: DataFrame, groupCol: String): DataFrame =
    sketchTable.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_distinct"))

  /** Self-gating query (q55): per group, the EXACT distinct count (the
    * oracle recomputes it) plus two booleans that must hold — the direct
    * sketch estimate AND the per-day-rollup estimate are each within 5%
    * of exact. (The two estimates are NOT gated against each other:
    * DataSketches answers small sets exactly from SET mode, while a union
    * always promotes to dense HLL — so direct and merged legitimately
    * differ at low cardinality even though both sit within sketch accuracy
    * of the truth.)
    */
  def rollupGate(
      df: DataFrame, groupCol: String, unit: Column, keyCol: String): DataFrame = {
    val merged = rollup(sketches(df, groupCol, unit, keyCol), groupCol)
      .withColumnRenamed("est_distinct", "est_merged")
    val direct = df.groupBy(col(groupCol))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col(keyCol))).as("est_direct"),
        count_distinct(col(keyCol)).as("n_exact"))
    merged.join(direct, groupCol)
      .select(
        col(groupCol), col("n_exact"),
        (abs(col("est_direct") - col("n_exact"))
          <= col("n_exact") * lit(0.05)).as("est_ok"),
        (abs(col("est_merged") - col("n_exact"))
          <= col("n_exact") * lit(0.05)).as("merge_ok"))
  }
}
