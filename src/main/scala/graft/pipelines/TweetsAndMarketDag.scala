package graft.pipelines

import graft.sources.JsonlGz
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's WHOLE daily DAG wired as a [[Dag]] — the composition
  * `tweets_and_market.py:97-104` declares: two independent branches from
  * `start`, each ending in a data-quality gate, joined at `finish`:
  *
  * {{{
  * start >> scrap_market_data >> market_data_quality_check >> finish
  * start >> analyse_tweets_sentiment >> insert_tweets_sentiment
  *       >> tweets_sentiment_data_quality_check >> finish
  * }}}
  *
  * [[DailyPipeline]] and [[MarketPipeline]] are the task BODIES; this
  * object contributes only wiring. The warehouse is a per-day parquet
  * layout under `outputRoot/warehouse/` written in overwrite mode, so a
  * re-run of the same execution date converges to identical state (the
  * reference's Airflow execution-date idempotency). Tasks hand data to
  * downstream tasks through the filesystem, never through driver state —
  * the same contract Airflow gives its operators.
  */
object TweetsAndMarketDag {

  final case class Build(
      tasks: Seq[Dag.Task],
      edges: Seq[(String, String)],
      marketPath: String,
      sentimentPath: String)

  /** Wire one execution date. `marketFeed` carries (index, value) rows for
    * the day (the reference scrapes these from Quandl on the driver —
    * HTTP stays outside the library, exactly like `market.py:15-28`).
    */
  def build(
      spark: SparkSession,
      inputRoot: String, outputRoot: String,
      marketFeed: DataFrame,
      year: Int, month: Int, day: Int,
      language: String = "en",
      retries: Int = 1, minRows: Long = 1): Build = {
    val dateLit = f"$year%04d-$month%02d-$day%02d"
    val marketPath = s"$outputRoot/warehouse/markets_value/$dateLit"
    val sentimentPath = s"$outputRoot/warehouse/tweets_sentiment/$dateLit"
    // XCom-style handoff: the analyse task records where it staged the
    // summary; the insert task loads from there.
    var stagedPath: String = null

    val tasks = Seq(
      Dag.Task("start", () => ()),

      Dag.Task("scrap_market_data", () => {
        val run = MarketPipeline.processDay(marketFeed, year, month, day)
        run.rows.write.mode("overwrite").parquet(marketPath)
      }, retries = retries),

      // reference `market.py:45-52`: a row must exist for EVERY index
      Dag.Task("market_data_quality_check", () => (), gate = () => {
        val inserted = spark.read.parquet(marketPath)
          .select(countDistinct(col("index"))).collect()(0).getLong(0)
        val expected = marketFeed.select(countDistinct(col("index")))
          .collect()(0).getLong(0)
        inserted > 0 && inserted == expected
      }),

      Dag.Task("analyse_tweets_sentiment", () => {
        val run = DailyPipeline.processDay(
          spark, inputRoot, outputRoot, year, month, day, language)
        stagedPath = run.stagedPath
      }, retries = retries),

      Dag.Task("insert_tweets_sentiment", () => {
        val staged = JsonlGz.clean(
          JsonlGz.read(spark, stagedPath, DailyPipeline.SummarySchema))
        staged.write.mode("overwrite").parquet(sentimentPath)
      }, retries = retries),

      // reference `tweets.py:136-142`: summarized tweet count above the bar
      Dag.Task("tweets_sentiment_data_quality_check", () => (), gate = () => {
        val n = spark.read.parquet(sentimentPath)
          .select(sum(col("positive_count") + col("negative_count") + col("na_count"))
            .cast("long")).collect()(0)
        !n.isNullAt(0) && n.getLong(0) >= minRows
      }),

      Dag.Task("finish", () => ()))

    val edges = Seq(
      "start" -> "scrap_market_data",
      "scrap_market_data" -> "market_data_quality_check",
      "market_data_quality_check" -> "finish",
      "start" -> "analyse_tweets_sentiment",
      "analyse_tweets_sentiment" -> "insert_tweets_sentiment",
      "insert_tweets_sentiment" -> "tweets_sentiment_data_quality_check",
      "tweets_sentiment_data_quality_check" -> "finish")

    Build(tasks, edges, marketPath, sentimentPath)
  }
}
