package graft

import java.nio.file.Files

import graft.pipelines.DailyPipeline
import graft.sources.JsonlGz

class DailyPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("end-to-end day run: extract -> sentiment summary -> staged load") {
    val root = Files.createTempDirectory("graft-daily").toString
    val dayDir = new java.io.File(s"$root/in/2020/01/21"); dayDir.mkdirs()
    val gz = new java.io.PrintStream(
      new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$dayDir/part-0.jsonl.gz")))
    gz.println("""{"full_text": "fast fast slow", "lang": "en"}""")   // positive
    gz.println("""{"full_text": "slow big join", "lang": "en"}""")    // negative (2n 1p)
    gz.println("""{"full_text": "nothing here", "lang": "en"}""")     // na
    gz.println("""{"full_text": "RT @x fast fast", "lang": "en"}""")  // retweet: dropped
    gz.println("""{"full_text": "fast", "lang": "de"}""")             // wrong lang: dropped
    gz.println("""not json at all""")                                 // corrupt: quarantined
    gz.close()

    val run = DailyPipeline.processDay(spark, s"$root/in", s"$root/out", 2020, 1, 21)

    val row = run.summary.collect()(0)
    assert(row.getAs[String]("tweets_sentiment_id") == "2020-01-21(en)")
    assert(row.getAs[Int]("positive_count") == 1)
    assert(row.getAs[Int]("negative_count") == 1)
    assert(row.getAs[Int]("na_count") == 1)

    // staged JSONL is re-readable with the declared warehouse schema
    val staged = JsonlGz.clean(
      JsonlGz.read(spark, run.stagedPath, DailyPipeline.SummarySchema))
    assert(staged.count() == 1)

    assert(run.ddl.contains("CREATE TABLE IF NOT EXISTS tweets_sentiment"))
    assert(run.ddl.contains("\"tweets_sentiment_id\" varchar(65535) PRIMARY KEY"))
    assert(run.copySql.startsWith("COPY tweets_sentiment"))
    assert(run.qualityCheckSql ==
      "SELECT count(*) AS n FROM tweets_sentiment WHERE \"date\" = ?")
  }
}
