package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (SURVEY §5: "bucketing for co-located joins").
  *
  * Writing both sides of a recurring fact⋈fact join bucketed by the join
  * key (same bucket count) lets Spark plan the join with NO Exchange on
  * either side — at 100 TB the shuffle being skipped is the dominant cost
  * of the join. Catalyst needs the tables in the catalog for bucket
  * metadata, hence `saveAsTable` rather than a plain parquet path.
  *
  * The one-time cost: the bucketed WRITE shuffles into the bucket layout.
  * Worth it when the key is joined repeatedly (fact-to-fact star keys,
  * dedup digests, user ids); pointless for one-shot joins.
  */
object BucketedTables {

  /** Persist `df` as a managed parquet table bucketed (and sorted) by
    * `keyCol` into `buckets` buckets.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * Exchange when both sides share the bucket count and key.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keyCol: String): DataFrame =
    read(spark, leftTable).join(read(spark, rightTable), Seq(keyCol))
}
