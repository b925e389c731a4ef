package graft

import graft.operators.{IvfKnn, Knn, Pq}
import org.apache.spark.sql.functions._

/** The distributed coarse trainer for production nlist (r14 verdict #4):
  * [[IvfKnn.trainCentroidsAtScale]] must be a pure function of the input
  * multiset (the [[IvfKnn.trainCentroids]] contract) and an index built
  * with it must hold the q107 recall floor at the same probe fraction.
  */
class IvfScaleSpec extends SparkTestBase {

  // deterministic near-uniform 64-dim unit vectors (the driver-corpus
  // shape — IVF's WORST case, the q27/q107 calibration regime)
  private lazy val emb = GenData.embeddings(spark, 2000).localCheckpoint()

  test("scale trainer is deterministic and partitioning-invariant") {
    // samplePerCell low enough that the hash THINNING is active (the
    // partitioning-sensitive stage if it were engine-random)
    val c1 = IvfKnn.trainCentroidsAtScale(
      emb, "vec_id", "embedding", nlist = 8, iters = 3, samplePerCell = 16)
    val c2 = IvfKnn.trainCentroidsAtScale(
      emb, "vec_id", "embedding", nlist = 8, iters = 3, samplePerCell = 16)
    val c3 = IvfKnn.trainCentroidsAtScale(
      emb.repartition(7), "vec_id", "embedding",
      nlist = 8, iters = 3, samplePerCell = 16)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.map(_.toSeq).toSeq == c3.map(_.toSeq).toSeq)
  }

  test("scale trainer returns exactly nlist unit-norm centroids") {
    val c = IvfKnn.trainCentroidsAtScale(
      emb, "vec_id", "embedding", nlist = 16, iters = 2, samplePerCell = 8)
    assert(c.length == 16)
    c.foreach { ctr =>
      val n = math.sqrt(ctr.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid norm $n")
    }
  }

  test("index built with the scale trainer holds the q107 recall floor " +
    "and parity with the driver Lloyd at the same probe fraction") {
    // nlist=128 (>= scaleTrainerThreshold), nprobe=32: the same 1/4
    // probe fraction as the registered q107 gate (nlist=32/nprobe=8,
    // floor 0.4 on near-uniform data)
    val model = Pq.train(emb, "vec_id", "embedding", m = 8, k = 32)
    val q = emb.filter(col("vec_id") < 10)
    val brute = Knn.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    val scratch = java.nio.file.Files.createTempDirectory("ivf_scale").toString

    def recallOf(coarse: Array[Array[Float]], tag: String): Double = {
      val idx = Pq.writeIndex(emb, "vec_id", "embedding", model,
        s"$scratch/$tag", nlist = 128, coarse = Some(coarse))
      val ann = Pq.ivfTopKIndexed(idx, emb, q, "vec_id", "embedding", 5,
        nprobe = 32, refine = 200)
      val hits = brute.select("query_id", "neighbor_id")
        .join(ann.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
      hits.toDouble / brute.count()
    }

    val atScale = recallOf(IvfKnn.trainCentroidsAtScale(
      emb, "vec_id", "embedding", nlist = 128), "scale")
    val driver = recallOf(IvfKnn.trainCentroids(
      emb, "vec_id", "embedding", nlist = 128), "driver")
    assert(atScale >= 0.4, s"scale-trainer recall $atScale below q107 floor")
    assert(atScale >= driver - 0.15,
      s"scale-trainer recall $atScale not at parity with driver Lloyd $driver")
  }

  test("writeIndex at production nlist freezes the scale trainer's centroids") {
    val small = GenData.embeddings(spark, 400).localCheckpoint()
    val model = Pq.train(small, "vec_id", "embedding", m = 8, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivf_disp").toString
    val idx = Pq.writeIndex(small, "vec_id", "embedding", model,
      s"$dir/idx", nlist = 128)
    val direct = IvfKnn.trainCentroidsAtScale(small, "vec_id", "embedding", 128)
    assert(idx.centroids.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
    // and the artifact self-contains them
    val re = Pq.readIndex(spark, s"$dir/idx")
    assert(re.centroids.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }
}
