package graft

import graft.streaming.StreamNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

class StreamNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog today"
  private val docB = "completely different words forming unique content here for testing"
  private val docC = "fresh unseen material with no overlap at all anywhere else"

  test("stream near-dup: dedup within batch, across batches via index, marker idempotency") {
    val indexDir = Files.createTempDirectory("snd_idx").toString
    val outDir = Files.createTempDirectory("snd_out").toString
    val ckpt = Files.createTempDirectory("snd_ckpt").toString

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    var batches = Vector.empty[(Long, Long)]
    val q = StreamNearDup.start(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      indexDir, outDir, ckpt, onBatch = (id, n) => batches :+= (id, n))
    try {
      // batch: A, copy-of-A (within-batch drop), B
      input.addData((1L, docA), (2L, docA), (3L, docB))
      q.processAllAvailable()
      // next batch: copy-of-A (drops via the PERSISTED index), C (new)
      input.addData((4L, docA), (5L, docC))
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.read.parquet(outDir).select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    assert(batches.map(_._2) == Vector(2L, 1L))

    // the index carries exactly the survivors
    assert(spark.read.parquet(s"$indexDir/shingles").select("id")
      .as[Long].collect().toSet == Set(1L, 3L, 5L))

    // checkpoint-replay semantics: re-applying a committed batch is a no-op
    val replay = Seq((1L, docA), (2L, docA), (3L, docB)).toDF("doc_id", "text")
    val rc = StreamNearDup.applyBatch(
      spark, replay, "doc_id", "text", indexDir, outDir, batchId = 0L)
    assert(rc == -1L)
    assert(spark.read.parquet(outDir).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L, 5L))

    // and a RETRIED uncommitted batch (marker missing, index already has
    // older batches) converges: new batch id, all near-dups of index drop
    val retry = Seq((6L, docB), (7L, "totally novel sentence nothing shares")).toDF("doc_id", "text")
    assert(StreamNearDup.applyBatch(
      spark, retry, "doc_id", "text", indexDir, outDir, batchId = 7L) == 1L)
    assert(StreamNearDup.applyBatch(
      spark, retry, "doc_id", "text", indexDir, outDir, batchId = 7L) == -1L)
    assert(spark.read.parquet(outDir).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L, 5L, 7L))
  }
}
