package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.pipelines.DailyPipeline
import graft.sources.{JdbcSink, SqlSink}

/** End-to-end LOAD over a real JDBC database: Derby in-memory (already on
  * the Spark unmanaged classpath) stands in for the reference's warehouse.
  * This is the reference's `PostgresHook.run` DDL + insert + row-count
  * gate flow (`tweets.py:94-142`, `market.py:35-42`) executed by the
  * library itself, not just built as strings.
  */
class JdbcSinkSpec extends SparkTestBase {

  private def connect(db: String): java.sql.Connection =
    DriverManager.getConnection(s"jdbc:derby:memory:$db;create=true")

  test("DailyPipeline summary loads end-to-end: DDL + distributed INSERT + gate") {
    val root = Files.createTempDirectory("graft-jdbc").toString
    val dayDir = new java.io.File(s"$root/in/2020/01/21"); dayDir.mkdirs()
    val gz = new java.io.PrintStream(
      new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$dayDir/part-0.jsonl.gz")))
    gz.println("""{"full_text": "fast fast slow", "lang": "en"}""")
    gz.println("""{"full_text": "slow big join", "lang": "en"}""")
    gz.close()

    val run = DailyPipeline.processDay(spark, s"$root/in", s"$root/out", 2020, 1, 21)

    val conn = connect("graft_e2e")
    try {
      // Derby dialect: no IF NOT EXISTS, varchar <= 32672
      JdbcSink.run(conn, Seq(
        SqlSink.createTableSql("tweets_sentiment", DailyPipeline.SummarySchema,
          primaryKey = Some("tweets_sentiment_id"),
          ifNotExists = false, varcharWidth = 4096)))

      // the distributed load: connection factory runs per partition
      JdbcSink.load(run.summary, "tweets_sentiment",
        () => DriverManager.getConnection("jdbc:derby:memory:graft_e2e"))

      // the reference's post-load quality gate, against the loaded key
      val key = java.sql.Timestamp.valueOf("2020-01-21 00:00:00")
      assert(JdbcSink.rowCountGate(conn, "tweets_sentiment", "date", key) == 1L)

      // loaded values survive the round trip
      val st = conn.createStatement()
      val rs = st.executeQuery(
        """SELECT "tweets_sentiment_id", "positive_count", "negative_count" FROM tweets_sentiment""")
      assert(rs.next())
      assert(rs.getString(1) == "2020-01-21(en)")
      assert(rs.getInt(2) == 1) // "fast fast slow"
      assert(rs.getInt(3) == 1) // "slow big join"
      assert(!rs.next())
      rs.close(); st.close()

      // a day that never loaded fails the gate loudly
      val missing = java.sql.Timestamp.valueOf("2020-01-22 00:00:00")
      val e = intercept[IllegalStateException] {
        JdbcSink.rowCountGate(conn, "tweets_sentiment", "date", missing)
      }
      assert(e.getMessage.contains("quality gate failed"))
    } finally conn.close()
  }

  test("run() surfaces the offending statement; batched load handles many rows") {
    import spark.implicits._
    val conn = connect("graft_batch")
    try {
      val e = intercept[java.sql.SQLException] {
        JdbcSink.run(conn, Seq("CREATE TABLE t (a int)", "NOT REAL SQL"))
      }
      assert(e.getMessage.contains("NOT REAL SQL"))

      // 1000 rows over batchSize 64, multiple partitions; table built from
      // the Spark schema so identifier quoting matches the INSERT
      val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(7)
      JdbcSink.run(conn, Seq(
        SqlSink.createTableSql("wide_load", df.schema, ifNotExists = false,
          varcharWidth = 32)))
      JdbcSink.load(df, "wide_load",
        () => DriverManager.getConnection("jdbc:derby:memory:graft_batch"),
        batchSize = 64)
      assert(JdbcSink.queryLong(conn, "SELECT count(*) FROM wide_load") == 1000L)
      assert(JdbcSink.queryLong(conn,
        """SELECT count(DISTINCT "id") FROM wide_load""") == 1000L)
    } finally conn.close()
  }
}
