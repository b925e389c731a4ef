package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply / slowly-changing-dimension operators — the incremental-load
  * semantics behind the reference's warehouse sink (its daily INSERTs are
  * append-only because execution dates never overlap; a real feed needs
  * latest-wins merge and history tracking, dend-covid19
  * `airflow/dags/tasks/tweets.py:94-101` re-runs a date by replacing it).
  */
object Merge {

  /** Latest-wins upsert (SCD type 1 / CDC apply): for every key, keep the
    * single row with the highest `versionCol`; an update beats the base row
    * at the same version. Both inputs must carry the same schema.
    *
    * Shape: ONE shuffle on the key (union is free), row_number in-frame.
    * General path — correct for any base/updates size ratio, multiple
    * updates per key, and keys absent from the base.
    */
  def upsert(
      base: DataFrame, updates: DataFrame,
      keyCols: Seq[String], versionCol: String): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
  }

  /** The small-updates scale path for the common CDC regime (base ≫
    * updates): reduce updates to latest-per-key (a shuffle over the SMALL
    * side only), then `base LEFT ANTI updates` + union — with a broadcast-
    * able update set the big base NEVER shuffles: the anti join is a
    * map-side hash probe and the union is a no-op partition concat.
    * Result-identical to [[upsert]] (spec-asserted).
    */
  def upsertSmallUpdates(
      base: DataFrame, updates: DataFrame,
      keyCols: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    val latest = updates.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // an update at version v REPLACES a base row at the same version
    // (same tie rule as upsert's _src ordering), so anti-join on key alone
    base.join(broadcast(latest.select(keyCols.map(col): _*)), keyCols, "left_anti")
      .unionByName(latest)
  }

  /** SCD type 2: collapse a change log into validity intervals. For each
    * key ordered by (`seqCol`, `tieCol`), keep only rows where `attrCol`
    * CHANGED vs the previous row, and emit
    * (key, attr, valid_from = seq, valid_to = next change's seq, NULL for
    * the current interval).
    *
    * Both windows share one partitioning on the key → a single Exchange
    * (the q12 sessionize pattern); per-key state is one lag value, nothing
    * is collected.
    */
  def scdIntervals(
      df: DataFrame, keyCol: String, seqCol: String, tieCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol), col(tieCol))
    val changes = df
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_prev").isNull || col(attrCol) =!= col("_prev"))
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"))
  }
}
