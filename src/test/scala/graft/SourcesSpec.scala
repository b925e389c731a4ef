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
    // columns are always quoted: reference schemas use reserved words
    // (date/year/month/day) and quoted-lowercase is dialect-portable
    assert(ddl.contains("\"tweets_sentiment_id\" varchar(65535) PRIMARY KEY"))
    assert(ddl.contains("\"date\" timestamp NOT NULL"))
    assert(ddl.contains("\"positive_count\" int NOT NULL"))

    assert(SqlSink.dropTableSql("t") == "DROP TABLE IF EXISTS t;")
    assert(SqlSink.insertSql("t", schema) ==
      "INSERT INTO t (\"tweets_sentiment_id\", \"date\", \"positive_count\")\nVALUES (?, ?, ?)")
    val copy = SqlSink.copySql("t", "s3://bucket/day.jsonl", "JSON", "IAM_ROLE 'arn:aws:iam::1:role/x'")
    assert(copy ==
      "COPY t\nFROM 's3://bucket/day.jsonl'\nIAM_ROLE 'arn:aws:iam::1:role/x'\nFORMAT AS JSON 'auto'")
    assert(SqlSink.rowCountCheckSql("t", "date") ==
      "SELECT count(*) AS n FROM t WHERE \"date\" = ?")
    intercept[IllegalArgumentException](SqlSink.copySql("t", "u", "XML", ""))
    intercept[IllegalArgumentException](SqlSink.createTableSql("t", schema, Some("nope")))
  }

  test("CsvSource: schema read, quarantine, gz round-trip") {
    val dir = tmpDir()
    val w = new java.io.PrintWriter(s"$dir/data.csv")
    w.println("id,name,score")
    w.println("1,alpha,2.5")
    w.println("2,beta,7.0")
    w.println("oops,gamma,not_a_number")
    w.close()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = graft.sources.CsvSource.read(spark, s"$dir/data.csv", schema)
    val ok = graft.sources.CsvSource.clean(df.cache())
    assert(ok.count() == 2)
    assert(graft.sources.CsvSource.corrupt(df).count() == 1)
    df.unpersist()

    val out = tmpDir() + "/out"
    graft.sources.CsvSource.write(ok, out)
    val back = graft.sources.CsvSource.clean(
      graft.sources.CsvSource.read(spark, out, schema).cache())
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "alpha", 2.5), (2L, "beta", 7.0)))
  }

  test("OrcSource: round-trip, pushdown reaches the ORC scan, daily layout prunes") {
    import graft.sources.OrcSource
    val dir = tmpDir()
    val df = (1L to 100L).map(i =>
      (i, s"name$i", java.sql.Timestamp.valueOf(f"2021-03-${i % 3 + 1}%02d 10:00:00")))
      .toDF("id", "name", "ts")
    OrcSource.write(df, s"$dir/flat")
    val back = OrcSource.read(spark, s"$dir/flat")
    assert(back.count() == 100)
    assert(back.schema.fieldNames.toSet == Set("id", "name", "ts"))

    // predicate pushdown + column pruning reach the ORC scan like parquet
    val q = back.filter($"id" === 7L).select("name")
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("EqualTo(id,7)"))
    assert(scan.requiredSchema.fieldNames.toSet == Set("id", "name"))

    // same y/m/d layout contract as PartitionedParquet: day filter prunes
    OrcSource.writeDaily(df, "ts", s"$dir/daily")
    val day = OrcSource.read(spark, s"$dir/daily").filter($"day" === 2)
    assert(day.count() == df.filter(dayofmonth($"ts") === 2).count())
    assert(day.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    // executed-scan metric: only day=2's files were read, not the table's
    val dayScan = day.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val total = OrcSource.read(spark, s"$dir/daily").inputFiles.length
    assert(dayScan.metrics("numFiles").value < total,
      s"pruned scan read ${dayScan.metrics("numFiles").value} of $total files")
  }

  test("deterministic sampling: same rows every run, bounded per stratum") {
    val df = (0L until 500L).map(i => (i, s"s${i % 7}")).toDF("id", "g")
    val a = graft.operators.Sampling.stratifiedN(df, "g", "id", 3)
      .as[(Long, String)].collect().toSet
    val b = graft.operators.Sampling.stratifiedN(df.repartition(13), "g", "id", 3)
      .as[(Long, String)].collect().toSet
    assert(a == b)                       // partitioning-independent
    assert(a.groupBy(_._2).forall(_._2.size == 3))
    val f = graft.operators.Sampling.hashFraction(df, "id", 0.2).count()
    assert(f > 50 && f < 150)            // ~100 expected
    // winners come from a bounded aggregation + broadcast semi-join —
    // never a full-width shuffle + per-stratum sort
    val plan = graft.operators.Sampling.stratifiedN(df, "g", "id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sampling must not window-sort:\n$plan")
    assert(plan.contains("partial_boundedtopk") && plan.contains("BroadcastHashJoin"),
      s"expected bounded agg + broadcast semi-join:\n$plan")
    // 64-bit id space: the hash must not overflow (ANSI would throw here)
    val big = Seq((9007199254740993L, "s"), (8446744073709551615L % Long.MaxValue, "s"))
      .toDF("id", "g")
    assert(graft.operators.Sampling.stratifiedN(big, "g", "id", 1).count() == 1)
  }

  test("bucketed join plans with zero Exchange (co-located)") {
    import graft.sources.BucketedTables
    val a = (0L until 1000L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (0L until 1000L).map(i => (i % 50, -i)).toDF("k", "vb")
    BucketedTables.writeBucketed(a, "graft_bucket_a", "k", 8)
    BucketedTables.writeBucketed(b, "graft_bucket_b", "k", 8)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // tiny test tables would broadcast; disable it so the planner must
      // choose between shuffled SMJ and the bucket-co-located SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.coLocatedJoin(spark, "graft_bucket_a", "graft_bucket_b", "k")
      assert(joined.count() == 1000L * 20) // 20 rows per key each side
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan) // no shuffle: co-located
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("Tables.events normalizes nanos-long ts to a usable timestamp") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    val d = ev.select(min(to_date($"ts")).cast("string")).collect()(0).getString(0)
    assert(d == "2024-01-01")
  }
}
