package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.pipelines.Backfill
import graft.sources.JsonlGz

class BackfillSpec extends SparkTestBase {

  private def writeDay(root: String, y: Int, m: Int, d: Int, lines: Seq[String]): Unit = {
    val dir = new java.io.File(f"$root/$y%04d/$m%02d/$d%02d"); dir.mkdirs()
    val gz = new java.io.PrintStream(
      new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$dir/part-0.jsonl.gz")))
    lines.foreach(gz.println)
    gz.close()
  }

  test("3-day backfill: good days pass, the corrupt day is quarantined, re-run is idempotent") {
    val root = Files.createTempDirectory("graft-backfill").toString
    writeDay(root + "/in", 2020, 2, 1, Seq(
      """{"full_text": "fast fast", "lang": "en"}""",
      """{"full_text": "slow slow big", "lang": "en"}"""))
    writeDay(root + "/in", 2020, 2, 2, Seq( // the outage day: nothing parseable
      """%% not json 1 %%""",
      """%% not json 2 %%"""))
    writeDay(root + "/in", 2020, 2, 3, Seq(
      """{"full_text": "nothing here", "lang": "en"}"""))

    def backfill() = Backfill.run(spark, s"$root/in", s"$root/out",
      LocalDate.of(2020, 2, 1), LocalDate.of(2020, 2, 3))

    val r1 = backfill()
    assert(r1.map(_.date.getDayOfMonth) == Seq(1, 2, 3))
    assert(r1.map(_.ok) == Seq(true, false, true))
    assert(r1.map(_.summaryRows) == Seq(2L, 0L, 1L))

    val bad = r1(1)
    assert(bad.corruptLines == 2L)
    assert(bad.error.exists(_.contains("quality gate")))
    assert(bad.attempts == 1, "a below-gate day is deterministic - no retry")
    // the dead letter holds exactly the unparseable raw lines
    val q = JsonlGz.read(spark, bad.quarantinePath.get + "/*",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("raw_line",
          org.apache.spark.sql.types.StringType))))
    assert(JsonlGz.clean(q).count() == 2)

    // staged summaries exist only for the good days
    val staged = new java.io.File(s"$root/out/tweets-sentiment").list().toSeq
    assert(staged.count(_.endsWith(".jsonl")) == 3) // day2 still stages (zero counts)

    // IDEMPOTENT: a full re-run reports the same outcomes and the same data
    val day1 = spark.read.json(s"$root/out/tweets-sentiment/2020-02-01.jsonl").collect().toSeq
    val r2 = backfill()
    assert(r2.map(o => (o.date, o.ok, o.summaryRows, o.corruptLines)) ==
      r1.map(o => (o.date, o.ok, o.summaryRows, o.corruptLines)))
    val day1Again = spark.read.json(s"$root/out/tweets-sentiment/2020-02-01.jsonl").collect().toSeq
    assert(day1Again == day1)
  }

  test("a day with no input at all is reported failed after retries, not thrown") {
    val root = Files.createTempDirectory("graft-backfill2").toString
    writeDay(root + "/in", 2020, 3, 1, Seq("""{"full_text": "fast", "lang": "en"}"""))
    // 2020-03-02 has no directory: the read throws, which counts as
    // possibly-transient -> retried, then reported
    val out = Backfill.run(spark, s"$root/in", s"$root/out",
      LocalDate.of(2020, 3, 1), LocalDate.of(2020, 3, 2), retries = 2)
    assert(out.map(_.ok) == Seq(true, false))
    assert(out(1).attempts == 3)
    assert(out(1).error.nonEmpty)
  }
}
