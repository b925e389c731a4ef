package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test star schema (TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory. All reads go
  * through `spark.read.parquet` so Catalyst can push filters and prune
  * columns into the scan — callers should `select` early.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` arrives in whatever physical form the generator last wrote;
    * normalize every observed variant to a session-TZ `TIMESTAMP`:
    *
    *  - parquet TIMESTAMP(NANOS): the vectorized reader rejects it, so
    *    sessions set `spark.sql.legacy.parquet.nanosAsLong` and the column
    *    arrives as a raw nanos long; convert with integer `div` (a double
    *    mantissa can't hold epoch-nanos exactly).
    *  - tz-less `timestamp[us]` (`isAdjustedToUTC=false`, pandas-written):
    *    Spark >=3.4 reads it as TIMESTAMP_NTZ; cast to TIMESTAMP. The
    *    session timezone is pinned to UTC (GraftSession), so the cast is an
    *    exact reinterpretation, not a wall-clock shift.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
