package graft

import java.sql.Timestamp

import graft.operators.Dedup
import graft.streaming.StreamDedupStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

class StreamDedupStatsSpec extends SparkTestBase {
  import spark.implicits._

  // offset from epoch: a row AT the initial watermark (ts = 0) would be
  // dropped as late before reaching the state handler
  private def t(min: Int) = new Timestamp((60 + min) * 60000L)

  private val textA = "the quick brown fox jumps"
  private val textB = "delta echo foxtrot golf hotel"
  private val textC = "mike november oscar papa quebec"
  private val textD = "unique romeo sierra tango uniform victor"

  // doc 9 lands in a LATER micro-batch: its near-dup partner (3) is found
  // via the persisted monitor index, and its window is still open
  private val batch1 = Seq(
    (1L, t(0), "s1", textA), (2L, t(1), "s1", textA), // exact dup
    (3L, t(2), "s1", textB), (4L, t(3), "s1", textB + " india"), // near dup J=0.75
    (5L, t(4), "s2", textC), (6L, t(5), "s2", textC), (7L, t(6), "s2", textC),
    (8L, t(7), "s2", textD))
  private val batch2 = Seq((9L, t(10), "s1", textB + " juliet"))
  private val allDocs = batch1 ++ batch2

  test("windowed exact rates + monitor hits roll up to the batch q110 stats") {
    val indexDir = Files.createTempDirectory("sds_idx").toString
    val hitsDir = Files.createTempDirectory("sds_hits").toString
    val ckptA = Files.createTempDirectory("sds_ckpt_a").toString
    val ckptB = Files.createTempDirectory("sds_ckpt_b").toString

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val docsDf = input.toDF().toDF("doc_id", "ts", "source", "text")
    val arr = StreamDedupStats.arrivals(spark, docsDf, "doc_id", "ts", "text", "source")

    val qWin = StreamDedupStats.windowStats(spark, arr,
      windowLen = java.time.Duration.ofHours(1), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("wds").outputMode("append")
      .option("checkpointLocation", ckptA).start()
    val qMon = StreamDedupStats.startNearDupMonitor(
      docsDf, "doc_id", "text", indexDir, hitsDir, ckptB)
    try {
      input.addData(batch1: _*)
      qWin.processAllAvailable(); qMon.processAllAvailable()
      // doc 9 is in-window and in-watermark; the far-future sentinel then
      // pushes the watermark past the window end, finalizing it
      input.addData(batch2: _*)
      input.addData((99L, t(240), "wm", "watermark sentinel wholly unrelated text"))
      qWin.processAllAvailable(); qMon.processAllAvailable()
    } finally { qWin.stop(); qMon.stop() }

    // finalized-window rows: one per (window, source), batch formula
    val win = spark.table("wds")
      .select($"source", $"n_docs", $"n_exact_dups", $"exact_dup_rate")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(win == Seq(("s1", 5L, 1L, 0.2), ("s2", 4L, 2L, 0.5)))

    // monitor hit-id set equals the batch pair-id set — including doc 2
    // (a dropped exact dup: only the every-arrival index finds its pair)
    // and the cross-batch pair (3, 9)
    val hitIds = spark.read.parquet(hitsDir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array($"id_a", $"id_b")).as("id"))
      .distinct().as[Long].collect().toSet
    assert(hitIds == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L))

    // the full rollup equals batch q110 on the delivered corpus
    val docs = allDocs.toDF("doc_id", "ts", "source", "text")
    val got = StreamDedupStats.rollup(
      spark.table("wds").toDF(), spark.read.parquet(hitsDir), docs,
      "doc_id", "source")
      .as[(String, Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val want = Dedup.dedupStats(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == want)

    // replay protocol: a committed monitor batch is a no-op
    val rc = StreamDedupStats.applyBatch(
      spark, batch1.toDF("doc_id", "ts", "source", "text"), "doc_id", "text",
      indexDir, hitsDir, batchId = 0L)
    assert(rc == -1L)

    // the live attribution matrix from the same accumulated hits equals
    // batch q118 on the delivered corpus, column for column minus
    // mean_jaccard (the monitor records hit ids, not scores)
    val gotM = StreamDedupStats.sourceMatrixRollup(
      spark.read.parquet(hitsDir), docs, "doc_id", "source")
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val wantM = Dedup.nearDupSourceMatrix(docs, "doc_id", "text", "source")
      .drop("mean_jaccard")
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(gotM.nonEmpty && gotM == wantM, s"stream matrix $gotM != batch $wantM")
  }

  test("a replayed doc id does not match ITSELF in the monitor index") {
    // doc 8 (textD — near-dup of nothing) is indexed in batch 0, then the
    // SAME id re-arrives as a NEW batch (a crawler re-fetch, not the
    // replay protocol's committed-batch case): it meets its own index row
    // at jaccard 1 and must NOT be recorded as a near-dup hit
    val indexDir = Files.createTempDirectory("sds_idx2").toString
    val hitsDir = Files.createTempDirectory("sds_hits2").toString
    val one = Seq((8L, t(0), "s2", textD)).toDF("doc_id", "ts", "source", "text")
    assert(StreamDedupStats.applyBatch(
      spark, one, "doc_id", "text", indexDir, hitsDir, batchId = 0L) == 0L)
    assert(StreamDedupStats.applyBatch(
      spark, one, "doc_id", "text", indexDir, hitsDir, batchId = 1L) == 0L)
  }

  test("batch windowStats finalizes every window (the backfill twin)") {
    // the stateful streaming path emits on event-time timeout, which a
    // batch run never fires — the batch branch must compute the same
    // finalized rows directly
    val docs = StreamDedupStats.arrivals(
      spark, batch1.toDF("doc_id", "ts", "source", "text"),
      "doc_id", "ts", "text", "source")
    val rows = StreamDedupStats.windowStats(spark, docs)
      .select($"source", $"n_docs", $"n_exact_dups", $"exact_dup_rate")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(("s1", 4L, 1L, 0.25), ("s2", 4L, 2L, 0.5)))
  }

  test("layout stamp: a restarted monitor under a different shingle n fails loudly") {
    val indexDir = Files.createTempDirectory("sds_conf_idx").toString
    val hitsDir = Files.createTempDirectory("sds_conf_hits").toString
    val one = Seq((8L, t(0), "s2", textD)).toDF("doc_id", "ts", "source", "text")
    assert(StreamDedupStats.applyBatch(
      spark, one, "doc_id", "text", indexDir, hitsDir, batchId = 0L) == 0L)
    // a monitor restarted with n=5 would band incompatibly and silently
    // under-count near-dups against everything already indexed — refuse
    val err = intercept[IllegalStateException] {
      StreamDedupStats.applyBatch(
        spark, one, "doc_id", "text", indexDir, hitsDir, batchId = 1L, n = 5)
    }
    assert(err.getMessage.contains("n: index=3 caller=5"))
    assert(StreamDedupStats.applyBatch(
      spark, one, "doc_id", "text", indexDir, hitsDir, batchId = 1L) == 0L)
  }
}
