package graft.sources

import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-place merge into a partitioned parquet table, rewriting ONLY the
  * partitions the updates touch — the reference's "re-run one execution
  * date" semantics (dend-covid19 `tweets_and_market.py` backfills replace
  * a day, `tweets.py:94-101` reload a date) generalized to keyed upserts.
  *
  * Shape: (1) the updates' distinct partition values — a bounded driver
  * collect, one value per touched partition; (2) read the CURRENT rows of
  * just those partitions (the `isin` filter prunes at the directory
  * level, untouched partitions are never opened); (3) [[Merge.upsert]]
  * updates over current; (4) write back in dynamic partition-overwrite
  * mode, so only the touched partitions' directories are replaced.
  *
  * The merged rows are `localCheckpoint`ed before the write: Spark
  * (correctly) refuses to overwrite a path that is also a read source of
  * the same plan; materializing the affected partitions first — they are
  * the SMALL slice, that's the point — cuts that cycle. Table formats with
  * a metadata layer (Delta/Iceberg/Hudi) solve this with file swaps
  * instead; this is the pure-parquet equivalent with the same rewrite
  * granularity.
  */
object PartitionedUpsert {

  def upsertInto(
      spark: SparkSession, tablePath: String, updates: DataFrame,
      keyCols: Seq[String], versionCol: String, partitionCol: String): Unit = {
    val touched = updates.select(col(partitionCol)).distinct().collect()
      .map(_.get(0)).toSeq
    if (touched.isEmpty) return
    val current = spark.read.parquet(tablePath)
      .filter(col(partitionCol).isin(touched: _*))
    val merged = Merge.upsert(current, updates, keyCols, versionCol)
      .localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy(partitionCol).parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
