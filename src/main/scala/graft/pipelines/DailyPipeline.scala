package graft.pipelines

import graft.functions.TextFunctions
import graft.sources.{JsonlGz, SqlSink}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's whole daily DAG (`airflow/dags/tweets_and_market.py`) as
  * one composable library call — the end-to-end proof that a user of the
  * reference can switch: extract (daily gz JSONL) → transform (filter +
  * sentiment + wide summary record, `tweets.py:50-77`) → load (JSONL
  * summary write + warehouse DDL/COPY statements, `tweets.py:82,94-133`)
  * → quality gate (`tweets.py:136-142`).
  *
  * Differences from the reference are deliberate Spark-first upgrades:
  * the majority vote is codegen'd column math instead of a Python UDF; the
  * summary is a groupBy-pivot, not an `rdd.collect()` into a dict on the
  * driver; the quality check is a returned statement, not a blocking
  * round-trip. Orchestration (Airflow, cron, Structured Streaming via
  * [[graft.streaming.EventStream]]) stays outside the library.
  */
object DailyPipeline {

  /** Input line schema (the tweets subset the reference reads). */
  val InputSchema: StructType = StructType(Seq(
    StructField("full_text", StringType),
    StructField("lang", StringType)))

  /** Warehouse table schema, mirroring `sql/create_tables.sql`. */
  val SummarySchema: StructType = StructType(Seq(
    StructField("tweets_sentiment_id", StringType, nullable = false),
    StructField("date", TimestampType, nullable = false),
    StructField("year", ShortType, nullable = false),
    StructField("month", ShortType, nullable = false),
    StructField("day", ShortType, nullable = false),
    StructField("language", StringType, nullable = false),
    StructField("positive_count", IntegerType, nullable = false),
    StructField("negative_count", IntegerType, nullable = false),
    StructField("na_count", IntegerType, nullable = false)))

  /** Everything the day's run produces: the summary row(s), where the
    * staged JSONL lives, and the statements the warehouse side runs.
    */
  case class DayRun(
      summary: DataFrame,
      stagedPath: String,
      ddl: String,
      copySql: String,
      qualityCheckSql: String)

  /** One execution date, reference semantics end to end.
    *
    * @param inputRoot  root of the `{y}/{m}/{d}/` daily gz-JSONL layout (R1)
    * @param outputRoot staging root for daily summary JSONL (R10)
    */
  def processDay(
      spark: SparkSession,
      inputRoot: String, outputRoot: String,
      year: Int, month: Int, day: Int,
      language: String = "en",
      credentialClause: String = "IAM_ROLE '<role-arn>'"): DayRun = {

    val inPath = f"$inputRoot/$year%04d/$month%02d/$day%02d/*.jsonl.gz"
    val stagedPath = f"$outputRoot/tweets-sentiment/$year%04d-$month%02d-$day%02d.jsonl"

    // Extract: explicit schema + quarantine (vs the reference's inference)
    val raw = JsonlGz.read(spark, inPath, InputSchema)
    val tweets = JsonlGz.clean(raw)

    // Transform: tweets.py:50-51 filters + :53-59 sentiment + :62-77 summary
    val filtered = tweets
      .filter(col("lang") === language && !col("full_text").startsWith("RT @"))
      .select(col("full_text"))
    val summary = filtered
      .select(TextFunctions.overallSentiment(col("full_text")).as("s"))
      .groupBy()
      .pivot("s", Seq("positive", "negative", "na"))
      .count()
      .select(
        lit(f"$year%04d-$month%02d-$day%02d($language)").as("tweets_sentiment_id"),
        to_timestamp(lit(f"$year%04d-$month%02d-$day%02d")).as("date"),
        lit(year).cast("short").as("year"),
        lit(month).cast("short").as("month"),
        lit(day).cast("short").as("day"),
        lit(language).as("language"),
        coalesce(col("positive"), lit(0L)).cast("int").as("positive_count"),
        coalesce(col("negative"), lit(0L)).cast("int").as("negative_count"),
        coalesce(col("na"), lit(0L)).cast("int").as("na_count"))

    // Load: staged JSONL + the warehouse statements (caller runs them)
    JsonlGz.write(summary, stagedPath)
    DayRun(
      summary = summary,
      stagedPath = stagedPath,
      ddl = SqlSink.createTableSql("tweets_sentiment", SummarySchema,
        primaryKey = Some("tweets_sentiment_id")),
      copySql = SqlSink.copySql("tweets_sentiment", stagedPath, "JSON", credentialClause),
      qualityCheckSql = SqlSink.rowCountCheckSql("tweets_sentiment", "date"))
  }
}
