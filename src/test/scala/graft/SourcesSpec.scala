package graft

import java.nio.file.Files

import graft.sources.{JsonlGz, PartitionedParquet, SqlSink, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-test").toString

  test("JsonlGz: explicit schema + corrupt-record quarantine") {
    val dir = tmpDir()
    val gz = new java.io.PrintStream(
      new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$dir/part-0.jsonl.gz")))
    gz.println("""{"id": 1, "name": "ok"}""")
    gz.println("""{"id": 2, "name": "also ok"}""")
    gz.println("""{"id": "NOT A NUMBER, unclosed""")
    gz.close()

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = JsonlGz.read(spark, s"$dir/*.jsonl.gz", schema)
    assert(JsonlGz.clean(df).count() == 2)
    assert(JsonlGz.clean(df).columns.toSeq == Seq("id", "name"))
    val bad = JsonlGz.corrupt(df).as[String].collect()
    assert(bad.length == 1 && bad(0).contains("NOT A NUMBER"))
  }

  test("JsonlGz: write/read round-trip through gzip") {
    val dir = tmpDir() + "/out"
    JsonlGz.write(Seq((1L, "x"), (2L, "y")).toDF("id", "name"), dir)
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val back = JsonlGz.clean(JsonlGz.read(spark, dir, schema))
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "x"), (2L, "y")))
  }

  test("PartitionedParquet: y/m/d layout, round-trip, partition pruning") {
    val dir = tmpDir() + "/table"
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 5.0),
      (2L, java.sql.Timestamp.valueOf("2024-02-20 11:00:00"), 7.0))
      .toDF("id", "ts", "v")
    PartitionedParquet.write(df, "ts", dir)
    assert(new java.io.File(s"$dir/year=2024/month=1/day=15").exists())

    val day = PartitionedParquet.readDay(spark, dir, 2024, 2, 20)
    assert(day.select("id").as[Long].collect().toSeq == Seq(2L))
    val scan = day.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }

  test("SqlSink: DDL/INSERT/COPY builders mirror the reference shapes") {
    val schema = StructType(Seq(
      StructField("tweets_sentiment_id", StringType, nullable = false),
      StructField("date", TimestampType, nullable = false),
      StructField("positive_count", IntegerType, nullable = false)))
    val ddl = SqlSink.createTableSql("tweets_sentiment", schema, primaryKey = Some("tweets_sentiment_id"))
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS tweets_sentiment"))
    assert(ddl.contains("tweets_sentiment_id varchar(65535) PRIMARY KEY"))
    assert(ddl.contains("date timestamp NOT NULL"))
    assert(ddl.contains("positive_count int NOT NULL"))

    assert(SqlSink.dropTableSql("t") == "DROP TABLE IF EXISTS t;")
    assert(SqlSink.insertSql("t", schema) ==
      "INSERT INTO t (tweets_sentiment_id, date, positive_count)\nVALUES (?, ?, ?)")
    val copy = SqlSink.copySql("t", "s3://bucket/day.jsonl", "JSON", "IAM_ROLE 'arn:aws:iam::1:role/x'")
    assert(copy ==
      "COPY t\nFROM 's3://bucket/day.jsonl'\nIAM_ROLE 'arn:aws:iam::1:role/x'\nFORMAT AS JSON 'auto'")
    assert(SqlSink.rowCountCheckSql("t", "date") == "SELECT count(*) AS n FROM t WHERE date = ?")
    intercept[IllegalArgumentException](SqlSink.copySql("t", "u", "XML", ""))
    intercept[IllegalArgumentException](SqlSink.createTableSql("t", schema, Some("nope")))
  }

  test("Tables.events normalizes nanos-long ts to a usable timestamp") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    val d = ev.select(min(to_date($"ts")).cast("string")).collect()(0).getString(0)
    assert(d == "2024-01-01")
  }
}
