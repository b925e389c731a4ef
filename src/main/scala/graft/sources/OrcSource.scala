package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC read/write — the second columnar format (SURVEY §2 sources).
  * Same scan-level guarantees as the parquet path: predicate pushdown and
  * column pruning reach the ORC reader (asserted in `SourcesSpec`), and
  * the y/m/d partitioned layout gives directory-level pruning for daily
  * incremental reads, interchangeable with [[PartitionedParquet]].
  */
object OrcSource {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Daily-partitioned ORC, same layout contract as
    * [[PartitionedParquet.write]] (dynamic partition overwrite: a re-run
    * day replaces only itself).
    */
  def writeDaily(df: DataFrame, tsCol: String, path: String): Unit =
    df
      .withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .write
      .partitionBy(PartitionedParquet.PartCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .orc(path)
}
