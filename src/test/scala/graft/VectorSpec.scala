package graft

import graft.operators.Knn
import graft.plans.{VectorFunctions, VectorKernels}
import org.apache.spark.sql.functions._

import scala.util.Random

class VectorSpec extends SparkTestBase {
  import spark.implicits._

  private def refCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("CosineSimilarity expression matches reference (through the full query path)") {
    val rnd = new Random(1)
    val rows = Seq.fill(50)((Seq.fill(16)(rnd.nextFloat() - 0.5f), Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val got = rows.toDF("a", "b")
      .select(VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .as[Double].collect()
    rows.zip(got).foreach { case ((a, b), c) =>
      assert(math.abs(c - refCosine(a, b)) < 1e-9)
    }
  }

  test("mismatched vector lengths raise, not truncate") {
    val df = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.cosineSimilarity(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("lshBuckets: deterministic, table-tagged, correct arity") {
    val v = Seq(Seq.fill(64)(0.25f)).toDF("v")
    val a = v.select(VectorFunctions.lshBuckets(col("v"), 8, 8).as("b")).as[Seq[Int]].collect()(0)
    val b = v.select(VectorFunctions.lshBuckets(col("v"), 8, 8).as("b")).as[Seq[Int]].collect()(0)
    assert(a == b)
    assert(a.size == 8)
    // table tag in the high bits: bucket t must lie in [t<<8, (t+1)<<8)
    a.zipWithIndex.foreach { case (bucket, t) => assert(bucket >> 8 == t) }
  }

  test("lshProbeBuckets: exact bucket first, Hamming-1 probes, probes=0 degenerates") {
    val rnd = new Random(11)
    val v = Seq(Seq.fill(64)(rnd.nextFloat() - 0.5f)).toDF("v")
    val exact = v.select(VectorFunctions.lshBuckets(col("v"), 6, 8).as("b"))
      .as[Seq[Int]].collect()(0)
    val p0 = v.select(VectorFunctions.lshProbeBuckets(col("v"), 6, 8, 0).as("b"))
      .as[Seq[Int]].collect()(0)
    assert(p0 == exact, "probes=0 must equal the exact bucket set")
    val p2 = v.select(VectorFunctions.lshProbeBuckets(col("v"), 6, 8, 2).as("b"))
      .as[Seq[Int]].collect()(0)
    assert(p2.size == 8 * 3)
    for (t <- 0 until 8) {
      val group = p2.slice(t * 3, t * 3 + 3)
      // exact bucket leads its table's group; every entry carries the tag
      assert(group.head == exact(t))
      group.foreach(b => assert(b >> 6 == t))
      // each probe flips exactly one sign bit of the exact bucket
      group.tail.foreach { b =>
        assert(Integer.bitCount((b ^ exact(t)) & 0x3f) == 1)
      }
      assert(group.distinct.size == 3)
    }
    // probes clamp at the bit count: all 1-bit neighbors, no repeats
    val pAll = v.select(VectorFunctions.lshProbeBuckets(col("v"), 6, 8, 99).as("b"))
      .as[Seq[Int]].collect()(0)
    assert(pAll.size == 8 * 7)
    assert(pAll.distinct.size == pAll.size)
  }

  test("brute-force kNN returns exact top-k (vs driver-side reference)") {
    val rnd = new Random(5)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Knn.bruteForceTopK(df, df.filter($"vec_id" < 3), "vec_id", "embedding", 4)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val expected = (0L until 3L).map { q =>
      val qv = vecs(q.toInt)._2
      q -> vecs.filter(_._1 != q)
        .map { case (id, v) => (id, BigDecimal(refCosine(qv, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1)
    }.toMap
    assert(got == expected)
  }

  test("IVF ANN: deterministic training, sane probes, k results per query") {
    val rnd = new Random(11)
    val vecs = (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val c1 = graft.operators.IvfKnn.trainCentroids(df, "vec_id", "embedding", nlist = 8)
    val c2 = graft.operators.IvfKnn.trainCentroids(df, "vec_id", "embedding", nlist = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // deterministic
    val out = graft.operators.IvfKnn.topK(df, df.filter($"vec_id" < 4), "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)
      .as[(Long, Int, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, r, n) => assert(n != q && r >= 1 && r <= 3) }
    // with nprobe == nlist the probe covers everything -> exact == brute force
    val full = graft.operators.IvfKnn.topK(df, df.filter($"vec_id" < 4), "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 8)
      .as[(Long, Int, Long)].collect().toSet
    val brute = Knn.bruteForceTopK(df, df.filter($"vec_id" < 4), "vec_id", "embedding", 3)
      .as[(Long, Int, Long)].collect().toSet
    assert(full == brute)
  }

  test("LSH ANN candidates are a subset ranked identically to brute force") {
    val rnd = new Random(9)
    val vecs = (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Knn.lshTopK(df, df.filter($"vec_id" < 5), "vec_id", "embedding", 3)
      .as[(Long, Int, Long)].collect()
    assert(out.nonEmpty)
    // every returned neighbor is a real row and never the query itself
    out.foreach { case (q, _, n) => assert(n != q && n >= 0 && n < 200) }
  }

  /** Clustered corpus: 30 clusters × 8 members around unit base vectors —
    * the regime ANN is used in (near-uniform vectors are its worst case and
    * gate nothing). Both ANN paths must clear a high recall floor here.
    */
  private lazy val clustered = {
    val rnd = new Random(23)
    val dim = 32
    def unit(v: Array[Float]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n).toSeq
    }
    (0 until 30).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until 8).map { m =>
        ((c * 8 + m).toLong, unit(base.map(_ + 0.2f * rnd.nextGaussian().toFloat)))
      }
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
  }

  test("int8 quantization: reconstruction within half a step, kNN recall >= 0.95") {
    import graft.operators.Embeddings
    val (mins, maxs) = Embeddings.dimRanges(clustered, "embedding")
    val deq = clustered.select(
      $"vec_id", $"embedding",
      Embeddings.dequantize(
        Embeddings.quantize($"embedding", mins, maxs), mins, maxs).as("roundtrip"))
    // every reconstructed component within half a quantization step
    val steps = mins.indices.map(i => (maxs(i) - mins(i)) / 255.0)
    val worstOk = deq
      .select(posexplode($"embedding").as(Seq("d", "v")), $"roundtrip")
      .select($"d", abs($"v".cast("double") -
        element_at($"roundtrip", ($"d" + 1).cast("int")).cast("double")).as("err"))
      .groupBy($"d").agg(max($"err").as("maxerr"))
      .collect()
      .forall(r => r.getDouble(1) <= steps(r.getInt(0)) / 2 + 1e-7)
    assert(worstOk, "reconstruction error exceeds half a quantization step")

    // quantized kNN reproduces the exact float top-5 on a clustered corpus
    val q = clustered.filter($"vec_id" % 8 === 0)
    val brute = Knn.bruteForceTopK(clustered, q, "vec_id", "embedding", 5)
    val qCorpus = clustered.select(
      $"vec_id",
      Embeddings.dequantize(
        Embeddings.quantize($"embedding", mins, maxs), mins, maxs).as("embedding"))
    val quant = Knn.bruteForceTopK(qCorpus, q, "vec_id", "embedding", 5)
    // cluster members sit ~0.2 sigma apart, so int8 noise may flip a rank
    // or two at the tail — but never more than a handful
    val hits = brute.select("query_id", "neighbor_id")
      .join(quant.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits >= 0.95 * brute.count(),
      s"quantized kNN recall ${hits.toDouble / brute.count()}")
  }

  test("int8 cosine kernel: identical to the float kernel on the same codes") {
    import graft.operators.Embeddings
    import graft.plans.VectorFunctions
    val rnd = new Random(7)
    val codes = (1 to 50).map { i =>
      (i.toLong,
        Seq.fill(16)((rnd.nextInt(255) - 127).toByte),
        Seq.fill(16)((rnd.nextInt(255) - 127).toByte))
    }.toDF("id", "a8", "b8")
      .withColumn("af", $"a8".cast("array<float>"))
      .withColumn("bf", $"b8".cast("array<float>"))
    // integer codes are exactly representable as floats/doubles, and both
    // kernels accumulate left-to-right in the same order -> bit equality
    val rows = codes.select(
      VectorFunctions.cosineSimilarityInt8($"a8", $"b8").as("ci"),
      VectorFunctions.cosineSimilarity($"af", $"bf").as("cf"))
      .as[(Double, Double)].collect()
    rows.foreach { case (ci, cf) => assert(ci == cf, s"$ci != $cf") }

    // mismatched lengths throw rather than silently truncating
    val bad = Seq((Seq[Byte](1, 2), Seq[Byte](1, 2, 3))).toDF("a8", "b8")
    intercept[Exception](
      bad.select(VectorFunctions.cosineSimilarityInt8($"a8", $"b8")).collect())

    // symmetric quantize -> int8 scoring reproduces float kNN on clusters
    val am = Embeddings.absMax(clustered, "embedding")
    val q8 = clustered.select(
      $"vec_id", Embeddings.quantizeSym($"embedding", am).as("qv"))
    val queries = clustered.filter($"vec_id" % 8 === 0)
    val brute = Knn.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
    val int8 = Knn.bruteForceTopK(
      q8, q8.filter($"vec_id" % 8 === 0), "vec_id", "qv", 5,
      score = VectorFunctions.cosineSimilarityInt8)
    val hits = brute.select("query_id", "neighbor_id")
      .join(int8.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits >= 0.95 * brute.count(),
      s"int8 kNN recall ${hits.toDouble / brute.count()}")
  }

  test("ANN recall gates hold on a clustered corpus (LSH >= 0.8, IVF >= 0.8)") {
    val q = clustered.filter($"vec_id" % 8 === 0) // one query per cluster
    val brute = Knn.bruteForceTopK(clustered, q, "vec_id", "embedding", 5)
    def recallOk(ann: org.apache.spark.sql.DataFrame, floor: Double): Boolean =
      Knn.recallGate(ann, brute, 5, floor)
        .as[(Long, Boolean)].collect().head == ((30L, true))
    assert(recallOk(Knn.lshTopK(clustered, q, "vec_id", "embedding", 5), 0.8))
    assert(recallOk(
      graft.operators.IvfKnn.topK(clustered, q, "vec_id", "embedding", 5), 0.8))
    // and the gate itself is honest: an ANN that returns garbage fails it
    val garbage = brute.withColumn("neighbor_id", lit(-1L))
    assert(!Knn.recallGate(garbage, brute, 5, 0.3)
      .as[(Long, Boolean)].collect().head._2)
  }
}
