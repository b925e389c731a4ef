package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Range join — points against [lo, hi) intervals (SURVEY §2
  * `q29_range_join`). A plain `v >= lo AND v < hi` join has no equi-key,
  * so Spark executes it as BroadcastNestedLoopJoin: every point × every
  * range. This is the standard bin-bucketed formulation instead:
  *
  *  - each point lands in exactly ONE bin (`floor(v / w)`);
  *  - each range is exploded to the bins it overlaps
  *    (`sequence(floor(lo/w), floor(hi/w))` — (len(range)/w + 1) rows);
  *  - equi-join on the bin (hash shuffle Catalyst can parallelize),
  *    then the exact `[lo, hi)` filter.
  *
  * Each matching (point, range) pair appears exactly once — the join key
  * is the point's single bin — so no dedup pass. Pick `binWidth` near the
  * median range length: wider bins → fewer replicas but more false
  * candidates; narrower → the reverse.
  */
object RangeJoin {

  def binJoin(
      points: DataFrame, ranges: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(valueCol) / binWidth))
    val r = ranges.withColumn(
      "__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(r, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
