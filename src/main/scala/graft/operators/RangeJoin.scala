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

  /** Interval × interval OVERLAP join (`a.lo < b.hi AND b.lo < a.hi`,
    * half-open intervals) — binJoin's general case, same idea: both sides
    * explode to the bins they span, equi-join on the bin, exact overlap
    * filter. Two overlapping intervals share every bin their INTERSECTION
    * spans, so to emit each pair exactly once (no dedup shuffle) the pair
    * is kept only in the intersection's FIRST bin:
    * `bin == max(floor(a.lo/w), floor(b.lo/w))` — both sides provably
    * contain that bin, and it is unique per pair.
    *
    * Shuffle: O(span/w) replicas per interval, hash-partitioned by bin —
    * never the all-pairs nested loop. Pick `binWidth` near the median
    * interval length (same trade as [[binJoin]]).
    */
  def overlapJoin(
      left: DataFrame, right: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn(
        "__bin",
        explode(sequence(
          floor(col(lo) / binWidth).cast("long"),
          floor(col(hi) / binWidth).cast("long"))))
    binned(left, loA, hiA).join(binned(right, loB, hiB), Seq("__bin"))
      .filter(
        col(loA) < col(hiB) && col(loB) < col(hiA) &&
          col("__bin") === greatest(
            floor(col(loA) / binWidth).cast("long"),
            floor(col(loB) / binWidth).cast("long")))
      .drop("__bin")
  }
}
