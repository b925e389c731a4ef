package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering for multi-dimensional scan
  * pruning — the layout tool behind "query any 2–3 columns and still skip
  * most files" at 100 TB.
  *
  * A parquet scan prunes files/row-groups via min/max statistics. Sorting
  * by ONE column makes its stats tight and every other column's stats
  * useless (each file spans the full range). Interleaving the bits of
  * several columns' bucket ranks and range-partition-sorting by that
  * z-value keeps every dimension's min/max locally tight, so a selective
  * predicate on ANY indexed dimension skips most files.
  *
  * The interleave is pure codegen'd column math (fixed-distance shifts —
  * whole-stage friendly, no UDF). Dimension ranges come from one bounded
  * min/max aggregate (2 doubles per dim — a deliberate driver-side
  * collect, the IvfKnn contract), or can be passed explicitly when known
  * (e.g. re-clustering a partition of a table with global stats).
  */
object ZOrderWriter {

  /** Interleave `bits` low bits of each (already-bucketed, non-negative)
    * dimension: bit j of dim d lands at position `j * k + d`. Requires
    * `k * bits <= 63`.
    */
  def interleaveBits(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    require(k >= 1 && k * bits <= 63, s"$k dims x $bits bits exceeds a long")
    val terms = for {
      j <- 0 until bits
      (b, d) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * k + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Scale `v` from [min, max] to an integer bucket in [0, 2^bits), null
    * and out-of-range values clamped to the edges.
    */
  def bucketize(v: Column, min: Double, max: Double, bits: Int): Column = {
    val hi = (1L << bits) - 1
    val span = if (max > min) max - min else 1.0
    val scaled = ((coalesce(v.cast("double"), lit(min)) - lit(min))
      / lit(span) * lit(hi.toDouble)).cast("long")
    least(greatest(scaled, lit(0L)), lit(hi))
  }

  /** The z-value column for `dims` with explicit per-dim ranges. */
  def zValue(dims: Seq[Column], ranges: Seq[(Double, Double)], bits: Int): Column =
    interleaveBits(
      dims.zip(ranges).map { case (d, (lo, hi)) => bucketize(d, lo, hi, bits) },
      bits)

  /** Cluster `df` on the z-order of `dimCols` into `numFiles` output files
    * under `path`. Range partitioning on the z-value gives each file one
    * contiguous Morton segment — a compact hyper-rectangle-ish region —
    * and the within-file sort tightens row-group stats too. Also writes
    * the per-file stats manifest [[ZOrderReader]] plans box queries
    * against (built from the fresh files' footers — metadata-only, no
    * data re-scan).
    */
  def write(
      df: DataFrame, dimCols: Seq[String], path: String, numFiles: Int,
      bits: Int = 16): Unit = {
    val ranges = dimRanges(df, dimCols)
    val z = zValue(dimCols.map(col), ranges, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    ZOrderReader.writeManifest(df.sparkSession, path, dimCols)
  }

  /** One min/max aggregate over the dims — bounded (2 doubles per dim). */
  def dimRanges(df: DataFrame, dimCols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = dimCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    dimCols.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
  }
}
