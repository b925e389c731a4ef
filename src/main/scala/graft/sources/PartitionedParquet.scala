package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet writer partitioned by year/month/day derived from a timestamp
  * column (SURVEY §2 `sources.PartitionedParquet`; reference R9/R10 — the
  * per-execution-date directory layout `{y:04d}/{m:02d}/{d:02d}`).
  *
  * At 100 TB this layout is what makes incremental daily processing cheap:
  * a date-filtered read prunes to one directory (partition pruning happens
  * before any file is opened), and each daily batch overwrites only its own
  * partition (dynamic partition overwrite), never the whole table.
  */
object PartitionedParquet {

  val PartCols: Seq[String] = Seq("year", "month", "day")

  /** Write `df` partitioned by date parts of `tsCol`. Dynamic partition
    * overwrite: only partitions present in `df` are replaced.
    */
  def write(df: DataFrame, tsCol: String, path: String): Unit =
    df
      .withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .write
      .partitionBy(PartCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  /** Read the whole partitioned table (partition columns come back as
    * regular columns; filters on them prune directories, not files).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read exactly one day's partition — the incremental-processing path.
    * The filter is on partition columns only, so the scan touches one
    * directory regardless of table size.
    */
  def readDay(spark: SparkSession, path: String, y: Int, m: Int, d: Int): DataFrame =
    read(spark, path)
      .filter(col("year") === y && col("month") === m && col("day") === d)
}
