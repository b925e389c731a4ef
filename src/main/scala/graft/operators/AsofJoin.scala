package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** AS-OF join — for every left row, the single most recent right row of
  * the same key with right.time <= left.time (SURVEY §2 `q28_asof_join`).
  * Spark has no native as-of join; the naive formulation is a range-
  * predicate join that Catalyst executes as a per-key nested loop.
  *
  * This implementation is the scalable union+window formulation:
  * tag both sides, union them (schema-aligned), sort each key's timeline
  * once, and carry the latest right payload forward with
  * `last(ignoreNulls)` over an unbounded-preceding frame. Exactly ONE
  * shuffle (the window partitioning), O(n log n) per key, no nested loop —
  * the same trick stream-processing engines use for temporal joins.
  *
  * Tie semantics: at equal timestamps the right row sorts first (side 0 <
  * side 1), so `>=` is inclusive like DuckDB's `ASOF JOIN ... ON l.t >=
  * r.t`. Right rows are pre-deduplicated to max(payload) per (key, time)
  * so ties inside the right side are deterministic.
  */
object AsofJoin {

  /** @param left     rows to enrich; all its columns pass through
    * @param right    (keyCol, timeCol, payloadCol) rows providing the as-of value
    * @param keyCol   equi-join key present on both sides
    * @param timeCol  ordering column (numeric or timestamp) on both sides
    * @param payloadCol right-side value column; emitted as `asof_<payloadCol>`
    */
  def joinPriorEqual(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, payloadCol: String): DataFrame = {
    val outCol = s"asof_$payloadCol"
    val leftCols = left.columns.toSeq

    val passCols = leftCols.filterNot(Seq(keyCol, timeCol).contains)

    val rDedup = right
      .groupBy(col(keyCol), col(timeCol))
      .agg(max(col(payloadCol)).as(outCol))
    val r = rDedup.select(
      Seq(col(keyCol), col(timeCol), lit(0).as("__side"), col(outCol)) ++
        passCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val l = left.select(
      Seq(col(keyCol), col(timeCol), lit(1).as("__side"),
        lit(null).cast(rDedup.schema(outCol).dataType).as(outCol)) ++
        passCols.map(col): _*)

    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(timeCol), col("__side"), col(outCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof", last(col(outCol), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col("__asof").as(outCol): _*)
  }
}
