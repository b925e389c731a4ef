package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The read half of the z-order story: FILE SKIPPING that uses the
  * clustering [[ZOrderWriter]] produces. Writing a tight layout proves
  * nothing unless a reader consumes the per-file min/max statistics —
  * this one prunes the file LIST before Spark ever opens a file, so a
  * selective box predicate on the indexed dims reads a handful of files
  * out of a 100 TB table instead of intersecting all of them.
  *
  * Two stat sources, same pruning logic:
  *  - a MANIFEST (`_graft_zorder_stats`, parquet, one row per file × dim)
  *    written once at cluster time from the data files' own footers —
  *    the scale path: a query plans against one small manifest read
  *    instead of listing + footer-reading every data file (the
  *    underscore prefix keeps Spark's own discovery from reading it as
  *    data);
  *  - the FOOTERS directly (metadata-only reads, never data pages) when
  *    no manifest exists — correct but O(files) driver round-trips, so
  *    it is the fallback, not the plan.
  *
  * Pruning is CONSERVATIVE: a file is skipped only when some predicate
  * dim's [min, max] provably misses the query box; a file with no stats
  * for a dim is kept. Parquet stats are true bounds, so a skipped file
  * cannot contain a matching row — the pruned scan returns byte-identical
  * rows to the full scan (asserted in ZOrderSpec).
  */
object ZOrderReader {

  /** Per-file, per-dim [min, max] from the parquet footers — row-group
    * stats folded per file. Metadata-only: reads each footer (a few KB at
    * the file tail), never data pages. The driver-side loop is O(files)
    * with bounded per-file state (2 doubles per dim); manifest writing
    * amortizes it to once per layout.
    */
  def footerStats(
      spark: SparkSession, dir: String, dimCols: Seq[String]): Seq[(String, String, Double, Double)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(dir)
    val fs = base.getFileSystem(conf)
    val files = fs.listStatus(base).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
    files.toSeq.flatMap { p =>
      val reader = ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      val footer = try reader.getFooter finally reader.close()
      val perDim = scala.collection.mutable.Map.empty[String, (Double, Double)]
      for {
        block <- footer.getBlocks.asScala
        cc <- block.getColumns.asScala
        name = cc.getPath.toDotString
        if dimCols.contains(name)
        stats = cc.getStatistics
        if stats != null && !stats.isEmpty && stats.hasNonNullValue
      } {
        val lo = toDouble(stats.genericGetMin.asInstanceOf[AnyRef])
        val hi = toDouble(stats.genericGetMax.asInstanceOf[AnyRef])
        val cur = perDim.get(name)
        perDim(name) = cur match {
          case Some((l, h)) => (math.min(l, lo), math.max(h, hi))
          case None => (lo, hi)
        }
      }
      perDim.toSeq.map { case (dim, (lo, hi)) => (p.toString, dim, lo, hi) }
    }
  }

  private def toDouble(v: AnyRef): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"non-numeric parquet statistic ${other.getClass.getName} — " +
        "z-order pruning supports numeric dims only")
  }

  private def manifestPath(dir: String) = s"$dir/_graft_zorder_stats"

  /** Build and persist the stats manifest for `dir` (one row per file ×
    * dim). Called by [[ZOrderWriter.write]]; idempotent (overwrite).
    */
  def writeManifest(spark: SparkSession, dir: String, dimCols: Seq[String]): Unit = {
    import spark.implicits._
    footerStats(spark, dir, dimCols)
      .toDF("file", "dim", "min", "max")
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(dir))
  }

  /** The data files a box query must read: those whose per-dim stats
    * intersect every `(dim, lo, hi)` predicate (and files unknown to the
    * stats source, kept conservatively). Uses the manifest when present,
    * footers otherwise.
    */
  def prunedFiles(
      spark: SparkSession, dir: String,
      box: Seq[(String, Double, Double)]): Seq[String] = {
    val stats: Seq[(String, String, Double, Double)] = {
      val mp = new Path(manifestPath(dir))
      val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(mp)) {
        spark.read.parquet(manifestPath(dir))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
          .toSeq
      } else footerStats(spark, dir, box.map(_._1))
    }
    val byFile = stats.groupBy(_._1)
    val all = listDataFiles(spark, dir)
    all.filter { f =>
      byFile.get(f) match {
        case None => true // no stats recorded: keep, never guess
        case Some(rows) =>
          val dimStats = rows.map(r => r._2 -> (r._3, r._4)).toMap
          box.forall { case (dim, lo, hi) =>
            dimStats.get(dim) match {
              case None => true
              case Some((mn, mx)) => mx >= lo && mn <= hi
            }
          }
      }
    }
  }

  /** Scan ONLY the files the box predicate can touch, then apply the
    * predicate exactly. Identical rows to a full scan + filter; the file
    * list is what shrank. (The residual filter still reaches the parquet
    * reader as a pushed predicate for row-group pruning inside the kept
    * files.)
    */
  def readBox(
      spark: SparkSession, dir: String,
      box: Seq[(String, Double, Double)]): DataFrame = {
    val files = prunedFiles(spark, dir, box)
    val residual = box.map { case (dim, lo, hi) =>
      col(dim).cast("double").between(lo, hi)
    }.reduce(_ && _)
    if (files.isEmpty) {
      // degenerate but legal: nothing intersects — preserve the schema
      spark.read.parquet(dir).filter(lit(false))
    } else {
      spark.read.parquet(files: _*).filter(residual)
    }
  }

  private def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(base).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .map(_.toString).toSeq
  }
}
