package graft

import graft.operators.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenOffsets: hand-computed offsets, cuts and straddles") {
    // docs 10,20,30,40 with 5,3,4,6 tokens, seqLen 8:
    // offsets 0,5,8,12; doc 10 spans seq 0 only (0..4), doc 20 straddles
    // 0->0 (5..7)? 5+3-1=7 -> seq 0; doc 30 at 8..11 -> seq 1;
    // doc 40 at 12..17 -> seqs 1-2
    val docs = Seq((10L, 5L), (20L, 3L), (30L, 4L), (40L, 6L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.tokenOffsets(docs, "doc_id", "n_tokens", seqLen = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (10L, 5L, 0L, 0L, 0L, 0L),
      (20L, 3L, 5L, 0L, 0L, 5L),
      (30L, 4L, 8L, 1L, 1L, 0L),
      (40L, 6L, 12L, 1L, 2L, 4L)))
  }

  test("distributed prefix sum equals the single-window reference") {
    val rnd = new scala.util.Random(99)
    // sparse, shuffled ids — buckets will be uneven, some empty
    val docs = rnd.shuffle((0 until 3000).toVector)
      .map(i => (i * 17L + (i % 7), (rnd.nextInt(300) + 1).toLong))
      .toDF("doc_id", "n_tokens")
    val fast = Packing.tokenOffsets(docs, "doc_id", "n_tokens", 2048, buckets = 13)
      .select("doc_id", "offset").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs
      .withColumn("offset", sum($"n_tokens").over(w) - $"n_tokens")
      .select("doc_id", "offset").as[(Long, Long)].collect().toMap
    assert(fast == ref)
    // and it is partitioning-independent
    val fast2 = Packing.tokenOffsets(
      docs.repartition(11), "doc_id", "n_tokens", 2048, buckets = 13)
      .select("doc_id", "offset").as[(Long, Long)].collect().toMap
    assert(fast2 == ref)
  }

  test("empty and zero-token inputs") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    assert(Packing.tokenOffsets(empty, "doc_id", "n_tokens", 8).count() == 0)
    // a zero-token doc occupies no room but still gets a position
    val z = Seq((1L, 0L), (2L, 4L)).toDF("doc_id", "n_tokens")
    val out = Packing.tokenOffsets(z, "doc_id", "n_tokens", 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out(0) == ((1L, 0L, 0L, 0L, 0L, 0L)))
    assert(out(1) == ((2L, 4L, 0L, 0L, 0L, 0L)))
  }

  test("lengthBatches: bands by token count, full batches, reproducible deal") {
    // 100 docs: ids 0-49 are 3 tokens (band 0 at width 4), 50-99 are
    // 6 tokens (band 1) -> each band deals 50 docs into batches of 8
    val docs = (0L until 100L)
      .map(i => (i, if (i < 50) "a b c" else "a b c d e f"))
      .toDF("doc_id", "text")
    val out = Packing.lengthBatches(docs, bandWidth = 4, batchSize = 8, buckets = 16)
      .as[(Long, Long, Long, Long, Long)].collect()

    assert(out.length == 100)
    assert(out.filter(_._3 == 0).map(_._1).sorted.toSeq == (0L until 50L))
    assert(out.filter(_._3 == 1).map(_._1).sorted.toSeq == (50L until 100L))
    // positions within each band are exactly 0..49; batches of 8 with a
    // ragged last batch of 2
    for (band <- Seq(0L, 1L)) {
      val b = out.filter(_._3 == band)
      assert(b.map(_._4).sorted.toSeq == (0L until 50L))
      val sizes = b.groupBy(_._5).map { case (k, v) => k -> v.length }
      assert(sizes == Map(0L -> 8, 1L -> 8, 2L -> 8, 3L -> 8, 4L -> 8, 5L -> 8, 6L -> 2))
    }
    // the deal follows the q80 hash order, not ingest order
    val ref = out.filter(_._3 == 0).sortBy(r =>
      ((r._1 % 2147483647L * 1103515245L + 12345L) % 2147483647L, r._1))
    assert(ref.map(_._4).toSeq == (0L until 50L), "hash-ordered positions")

    // partitioning independence: same assignment from a different layout
    val again = Packing.lengthBatches(docs.repartition(7), bandWidth = 4, batchSize = 8,
      buckets = 16).as[(Long, Long, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)

    // scale shape: per-window partitions are (band, hash-bucket), never a
    // whole-band single partition
    val plan = Packing.lengthBatches(docs, bandWidth = 4, batchSize = 8, buckets = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"unpartitioned exchange:\n$plan")
  }

  test("paddingWaste: banded batching strictly beats naive on length-skewed data") {
    // ids interleave short (2-token) and long (40-token) docs, so naive
    // id-blocks mix lengths (pad to 40) while banding separates them
    val docs = (0L until 64L)
      .map(i => (i, if (i % 2 == 0) "a b" else Seq.fill(40)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.paddingWaste(docs, bandWidth = 16, batchSize = 8)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // both strategies account every doc and every real token exactly once
    assert(out("banded")._3 == 64L && out("naive")._3 == 64L)
    assert(out("banded")._4 == out("naive")._4)
    assert(out("banded")._4 == 32L * 2 + 32L * 40)
    // naive: every 8-block has both lengths -> pads everything to 40
    assert(out("naive")._5 == 64L * 40)
    // banded: shorts pad to 2, longs to 40 -> zero waste here
    assert(out("banded")._5 == 32L * 2 + 32L * 40)
    assert(out("banded")._6 == 0.0)
    assert(out("banded")._6 < out("naive")._6)
  }
}
