package graft

import graft.operators.{Chunking, Sampling}
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunk boundaries: short doc, exact window, one-past, overlap content") {
    def words(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, words(5, "a")),   // shorter than one window -> 1 whole chunk
      (2L, words(8, "b")),   // exactly one window
      (3L, words(9, "c")),   // one past -> 2 chunks, second truncated
      (4L, words(20, "d"))   // ceil((20-8)/6)+1 = 3 chunks
    ).toDF("doc_id", "text")
    val out = Chunking.chunks(docs, window = 8, stride = 6)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 5L, words(5, "a")),
      (2L, 0L, 0L, 8L, words(8, "b")),
      (3L, 0L, 0L, 8L, (1 to 8).map(i => s"c$i").mkString(" ")),
      (3L, 1L, 6L, 3L, "c7 c8 c9"),
      (4L, 0L, 0L, 8L, (1 to 8).map(i => s"d$i").mkString(" ")),
      (4L, 1L, 6L, 8L, (7 to 14).map(i => s"d$i").mkString(" ")),
      (4L, 2L, 12L, 8L, (13 to 20).map(i => s"d$i").mkString(" "))))
    // every token position is inside at least one chunk (stride <= window)
    val covered = out.filter(_._1 == 4L).flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered == (0L until 20L).toSet)
    // stride == window tiles without overlap
    val tiled = Chunking.chunks(docs.filter($"doc_id" === 4L), window = 5, stride = 5)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(tiled.map(_._4).sum == 20L)
    intercept[IllegalArgumentException] {
      Chunking.chunks(docs, window = 4, stride = 5)
    }
  }

  test("mixture resample: tau=0.5 quotas, partitioning independence, tau=1 natural") {
    // head source 160 docs, mid 40, tail 10: 6-dp sqrt weights 12.649111,
    // 6.324555, 3.162278 -> shares of 22.135944; quotas at T=100:
    // floor(57.14..)=57, floor(28.57..)=28, floor(14.28..)=14 — but the
    // tail stratum only HAS 10 docs, so its quota caps at the stratum size
    val docs = (0 until 160).map(i => (i.toLong, "head")) ++
      (1000 until 1040).map(i => (i.toLong, "mid")) ++
      (2000 until 2010).map(i => (i.toLong, "tail"))
    val df = docs.toDF("doc_id", "source")
    val out = Sampling.mixtureResample(df, "source", "doc_id", 100L)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("head" -> 57L, "mid" -> 28L, "tail" -> 10L))
    // temperature up-samples the tail: natural share of tail is 10/210 ~ 4.8%,
    // tau=0.5 quotas it at 14% (capped here by the tiny stratum) — and
    // tau=1 reproduces the natural mixture
    val nat = Sampling.mixtureResample(df, "source", "doc_id", 100L, temperature = 1.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(nat == Map("head" -> 76L, "mid" -> 19L, "tail" -> 4L))
    // deterministic under any partitioning: same ROWS, not just counts
    val a = out.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.mixtureResample(df.repartition(13), "source", "doc_id", 100L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.mixtureResample(df, "source", "doc_id", 100L, temperature = 0.7)
    }
  }

  test("split assignment is a total, disjoint, pure function of the id") {
    val ids = (0L until 10000L).map(i => Tuple1(i * 7919L)).toDF("doc_id")
    val out = Sampling.assignSplits(ids, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // every doc gets exactly one label; shares land near 80/10/10
    assert(out.values.sum == 10000L)
    assert(out("train") > 7800 && out("train") < 8200)
    assert(out("val") > 850 && out("val") < 1150)
    // same ids, any partitioning -> same assignment row-for-row
    val a = Sampling.assignSplits(ids, "doc_id").as[(Long, String)].collect().toSet
    val b = Sampling.assignSplits(ids.repartition(13), "doc_id").as[(Long, String)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(ids, "doc_id", Seq(("a", 5000), ("b", 4000)))
    }
  }

  test("epoch-salted shuffle: fresh permutation per epoch, epoch 0 is the base order") {
    val ids = (0L until 400L).map(Tuple1(_)).toDF("doc_id")
    def order(e: Int) = Sampling.shuffleOrder(ids, "doc_id", buckets = 16, epoch = e)
      .select("doc_id", "ordinal").as[(Long, Long)].collect()
      .sortBy(_._2).map(_._1).toSeq
    val e0 = order(0); val e1 = order(1); val e2 = order(2)
    assert(e0 == order(0)) // reproducible
    assert(e0 == Sampling.shuffleOrder(ids, "doc_id", buckets = 16)
      .select("doc_id", "ordinal").as[(Long, Long)].collect()
      .sortBy(_._2).map(_._1).toSeq) // epoch 0 = the oracled base order
    // every epoch is a full permutation, and consecutive epochs genuinely
    // reshuffle (an affine salt would replay ~the same order rotated):
    // the first 40 positions of neighboring epochs share few docs
    Seq(e0, e1, e2).foreach(e => assert(e.sorted == (0L until 400L)))
    assert(e0.take(40).toSet.intersect(e1.take(40).toSet).size < 15)
    assert(e1.take(40).toSet.intersect(e2.take(40).toSet).size < 15)
    // epoch steps use their own multiplier, not the split's: the epoch-1
    // prefix must hold ~80% train docs, not be a deterministic subset of
    // the train split (which stepping with the split multiplier causes)
    val splitOf = Sampling.assignSplits(ids, "doc_id")
      .as[(Long, String)].collect().toMap
    val prefTrain = e1.take(100).count(splitOf(_) == "train")
    assert(prefTrain > 65 && prefTrain < 95,
      s"epoch-1 prefix holds $prefTrain/100 train docs (want ~80)")
  }

  test("hashFraction composed after a rank-sampler keeps ~fraction of the sample") {
    // 2000 docs, one source; sample the 400 lowest-idHash docs (what every
    // rank-sampler selects), then cut 20% — a raw-idHash cut would keep
    // ALL 400 (the winners ARE the low-hash tail); the domain-separated
    // cut must keep ~80
    val docs = (0L until 2000L).map(i => (i, "s")).toDF("doc_id", "source")
    val sampled = Sampling.stratifiedN(docs, "source", "doc_id", 400)
    val kept = Sampling.hashFraction(sampled, "doc_id", 0.2).count()
    assert(kept > 50 && kept < 110, s"cut kept $kept of 400 (want ~80)")
    // and on the full corpus the fraction is still honest
    val whole = Sampling.hashFraction(docs, "doc_id", 0.2).count()
    assert(whole > 320 && whole < 480, s"whole-corpus cut kept $whole of 2000")
    // the two THRESHOLD cuts use different multipliers: splitting a
    // hashFraction sample must still give ~80/10/10, not all-train (a
    // shared composed hash would put every survivor below the train cut)
    val frTrain = Sampling.assignSplits(
      Sampling.hashFraction(docs, "doc_id", 0.5), "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = frTrain.values.sum.toDouble
    assert(frTrain("train") / n > 0.7 && frTrain("train") / n < 0.9,
      s"fraction-then-split skewed: $frTrain")
  }

  test("shuffle order equals the single-window reference and permutes 0..n-1") {
    val ids = Seq(3L, 900000007L, 17L, 42L, 5L, 123456789L, 0L, 2147483646L)
      .map(Tuple1(_)).toDF("doc_id")
    val out = Sampling.shuffleOrder(ids, "doc_id", buckets = 4)
      .select("doc_id", "ordinal").as[(Long, Long)].collect().toMap
    val ref = ids.select(col("doc_id"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(Sampling.idHash(col("doc_id")), col("doc_id"))) - 1).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(out == ref)
    assert(out.values.toSeq.sorted == (0L until 8L))
    // partitioning independence
    val rep = Sampling.shuffleOrder(ids.repartition(5), "doc_id", buckets = 4)
      .select("doc_id", "ordinal").as[(Long, Long)].collect().toMap
    assert(rep == out)
    assert(Sampling.shuffleOrder(ids.limit(0), "doc_id").count() == 0)
  }

  test("curriculum order: easy bands first, hash-shuffled within, nulls last") {
    val docs = Seq(
      (1L, Some(30L)), (2L, Some(10L)), (3L, Some(10L)), (4L, Some(20L)),
      (5L, Some(10L)), (6L, None), (7L, Some(20L)))
      .toDF("doc_id", "difficulty")
    val out = Sampling.curriculumOrder(docs, "doc_id", "difficulty")
      .select("doc_id", "ordinal").as[(Long, Long)].collect().toMap
    assert(out.values.toSeq.sorted == (0L until 7L))
    // single-window reference: (score, idHash, id) with nulls last
    val ref = docs.select(col("doc_id"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(coalesce(col("difficulty"), lit(Long.MaxValue)),
          Sampling.idHash(col("doc_id")), col("doc_id"))) - 1).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(out == ref)
    // band monotonicity: every 10-doc ordinal < every 20-doc < 30 < null
    assert(Seq(2L, 3L, 5L).map(out).max < Seq(4L, 7L).map(out).min)
    assert(Seq(4L, 7L).map(out).max < out(1L) && out(1L) < out(6L))
    // partitioning independence
    val rep = Sampling.curriculumOrder(docs.repartition(5), "doc_id", "difficulty")
      .select("doc_id", "ordinal").as[(Long, Long)].collect().toMap
    assert(rep == out)
  }
}
