package graft.pipelines

import graft.sources.SqlSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** The reference DAG's SECOND branch (`market.py`) as a library call —
  * with [[DailyPipeline]] (tweets) this completes the whole
  * `tweets_and_market.py` surface.
  *
  * The reference scrapes Quandl per index on the driver
  * (`market.py:15-28` — HTTP, not a data-processing concern; the caller
  * supplies the day's feed, e.g. via [[graft.sources.CsvSource]]), then
  * per index builds a `markets_value` row with a `{date}({index})`
  * composite id and inserts it (`market.py:29-41`,
  * `sql/insert_markets_value.sql`), and finally gates on rows existing
  * per (date, index) (`market.py:45-52`).
  *
  * Spark-first differences: the per-index driver loop becomes one
  * DataFrame transform (any number of indices, one plan); the INSERT is
  * the parameterized builder executed by [[graft.sources.JdbcSink.load]]
  * distributed; missing values stay NULL rows exactly like the
  * reference's `None`.
  */
object MarketPipeline {

  /** `sql/create_tables.sql`'s markets_value shape ("index" and "value"
    * are reserved words — SqlSink quotes all identifiers).
    */
  val MarketSchema: StructType = StructType(Seq(
    StructField("markets_value_id", StringType, nullable = false),
    StructField("date", TimestampType, nullable = false),
    StructField("year", ShortType, nullable = false),
    StructField("month", ShortType, nullable = false),
    StructField("day", ShortType, nullable = false),
    StructField("index", StringType, nullable = false),
    StructField("value", FloatType, nullable = true)))

  case class MarketRun(
      rows: DataFrame,
      ddl: String,
      insertSql: String,
      qualityCheckSql: String)

  /** One execution date. `feed` carries (index, value) for the day —
    * value nullable for indices the upstream returned nothing for.
    */
  def processDay(feed: DataFrame, year: Int, month: Int, day: Int): MarketRun = {
    val dateLit = f"$year%04d-$month%02d-$day%02d"
    val rows = feed.select(
      concat(lit(dateLit), lit("("), col("index"), lit(")")).as("markets_value_id"),
      to_timestamp(lit(dateLit)).as("date"),
      lit(year).cast("short").as("year"),
      lit(month).cast("short").as("month"),
      lit(day).cast("short").as("day"),
      col("index"),
      col("value").cast("float").as("value"))
    MarketRun(
      rows = rows,
      ddl = SqlSink.createTableSql("markets_value", MarketSchema,
        primaryKey = Some("markets_value_id")),
      insertSql = SqlSink.insertSql("markets_value", MarketSchema),
      // the reference gates per (date, index), not just per date
      qualityCheckSql =
        """SELECT count(*) AS n FROM markets_value WHERE "date" = ? AND "index" = ?""")
  }
}
