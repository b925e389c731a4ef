package graft

import java.sql.Timestamp

import graft.operators.Lines
import graft.streaming.StreamLines
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamLinesSpec extends SparkTestBase {
  import spark.implicits._

  // a corpus whose docs share nav/footer chrome plus unique content; doc 9
  // is ALL chrome (the doc-level escalation must drop it), doc 8 has a
  // whitespace-only line (structural — never counted, never removed)
  private val nav = "Home | About | Contact"
  private val footer = "(c) 2021 Example Corp"
  private def corpus: Seq[(Long, String, String)] =
    (0L until 8L).map { i =>
      (i, s"$nav\nunique body line $i\nmore body ${i * 31}\n$footer",
        if (i < 4) "srcA" else "srcB")
    } ++ Seq(
      (8L, s"$nav\n   \nbody with blank ${99}\n$footer", "srcB"),
      (9L, s"$nav\n$footer", "srcB"))

  test("stream clean == batch lineDedup on the finalized corpus; zero streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text", "source")

    // the nightly artifact: corpus-repeated line hashes
    val boiler = Lines.boilerplateLines(docs).as[Long].collect()
    assert(boiler.length == 2, s"expected nav+footer, got ${boiler.length}")

    val input = MemoryStream[(Long, String, String)]
    val q = StreamLines
      .clean(input.toDF().toDF("doc_id", "text", "source"), boiler, maxRemovedFrac = 0.5)
      .select("doc_id", "n_lines", "n_removed", "removed_frac", "keep", "text_clean")
      .writeStream.format("memory").queryName("stream_lines")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(corpus.take(4): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(4): _*)
      q.processAllAvailable()

      val streamed = spark.table("stream_lines")
        .as[(Long, Long, Long, Double, Boolean, String)].collect().sortBy(_._1).toSeq
      val batch = Lines.lineDedup(docs, "doc_id", "text",
          minDocs = 2, maxRemovedFrac = 0.5)
        .select("doc_id", "n_lines", "n_removed", "removed_frac", "keep", "text_clean")
        .as[(Long, Long, Long, Double, Boolean, String)].collect().sortBy(_._1).toSeq
      assert(streamed == batch)

      // semantics spot checks: chrome stripped, all-chrome doc dropped,
      // whitespace line kept and uncounted
      val byId = streamed.map(r => r._1 -> r).toMap
      assert(byId(0L)._6 == "unique body line 0\nmore body 0")
      assert(!byId(9L)._5 && byId(9L)._2 == 2L && byId(9L)._3 == 2L)
      assert(byId(8L)._2 == 3L && byId(8L)._6.contains("   "))

      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected zero streaming state: ${q.lastProgress}")
    } finally q.stop()
  }

  test("monitor: per-(window, source) drop counts and mean removed_frac on finalize") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text", "source")
    val boiler = Lines.boilerplateLines(docs).as[Long].collect()

    val t0 = Timestamp.valueOf("2021-05-01 10:00:00")
    def ts(m: Int) = Timestamp.valueOf(s"2021-05-01 10:0$m:00")
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val cleaned = StreamLines.clean(
      input.toDF().toDF("doc_id", "ts", "text", "source"), boiler,
      maxRemovedFrac = 0.5)
    val q = StreamLines.monitor(cleaned, "ts", "source", "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("stream_lines_mon")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(corpus.map { case (id, tx, src) => (id, ts((id % 5).toInt), tx, src) }: _*)
      q.processAllAvailable()
      // advance the watermark past the window end to finalize it
      input.addData((99L, Timestamp.valueOf("2021-05-01 10:25:00"), "late tick", "srcB"))
      q.processAllAvailable()

      val rows = spark.table("stream_lines_mon")
        .as[(Timestamp, String, Long, Long, Double)].collect()
        .filter(_._1 == t0).sortBy(_._2).toSeq
      // srcA: docs 0-3, none dropped (2/4 removed = 0.5 ≤ 0.5); srcB:
      // docs 4-9 — doc 8 (2/3 removed) and doc 9 (all-chrome) drop
      assert(rows.map(r => (r._2, r._3, r._4)) ==
        Seq(("srcA", 4L, 0L), ("srcB", 6L, 2L)))
      val batchMean = Lines.lineDedup(docs, "doc_id", "text",
          minDocs = 2, maxRemovedFrac = 0.5)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .groupBy("source").agg(round(avg(col("removed_frac")), 4).as("m"))
        .as[(String, Double)].collect().toMap
      rows.foreach { case (_, src, _, _, m) => assert(m == batchMean(src)) }
    } finally q.stop()
  }
}
