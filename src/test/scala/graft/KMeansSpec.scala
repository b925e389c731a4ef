package graft

import graft.operators.KMeans
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicate seeds: tie to smallest cluster, empty cluster keeps centroid, recovery") {
    // ids 0,1 coincide -> seed c1 duplicates c0; iteration 1 assigns ALL
    // points to c0 (every distance ties, smallest cluster wins), so c1 is
    // EMPTY and must carry its (0,0) centroid. c0's mean moves to
    // (0.333333, 0); iteration 2 then re-captures ids 0,1 for c1 and
    // leaves id 2 to c0, whose mean snaps onto (1, 0) — the final
    // assignment is the natural 2-clustering with all distances exactly 0.
    val emb = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)), (2L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.cluster(emb, k = 2, iters = 2)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 1, 0.0), (1L, 1, 0.0), (2L, 0, 0.0)))
  }

  test("clustering is partitioning-independent") {
    val pts = (0L until 60L).map { i =>
      val c = (i % 3).toFloat
      (i, Array(3f * c + (i % 7) * 0.01f, -2f * c + (i % 5) * 0.01f))
    }
    val a = KMeans.cluster(pts.toDF("vec_id", "embedding").repartition(7), k = 3, iters = 3)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    val b = KMeans.cluster(pts.toDF("vec_id", "embedding").repartition(2), k = 3, iters = 3)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // three well-separated generators -> members of one generator agree
    val byGen = a.groupBy(_._1 % 3).values.map(_.map(_._2).distinct.size)
    assert(byGen.forall(_ == 1), s"generator split across clusters: $a")
  }

  test("clusterProfile: generator-pure clusters report purity 1.0 and their label") {
    val pts = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      (i, Array(3f * c + (i % 7) * 0.01f, -2f * c + (i % 5) * 0.01f), c)
    }
    val out = KMeans
      .clusterProfile(pts.toDF("vec_id", "embedding", "label"), k = 3, iters = 3)
      .as[(Int, Long, Double, Int, Double)].collect().sortBy(_._1).toSeq
    assert(out.size == 3)
    assert(out.map(_._2).sum == 60L)
    out.foreach { r =>
      assert(r._5 == 1.0, s"expected pure clusters: $out")
      assert(r._3 < 0.01, s"compact clusters expected: $out")
    }
    assert(out.map(_._4).toSet == Set(0, 1, 2))
  }

  test("final assignment is scan-shaped: centroids are literals, no shuffle") {
    val emb = (0L until 40L).map(i => (i, Array(i.toFloat, (i % 4).toFloat)))
      .toDF("vec_id", "embedding")
    val plan = KMeans.cluster(emb, k = 4, iters = 1).queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"assignment must not shuffle the corpus:\n$plan")
    // collect can be blind inside an AQE wrapper — assert on the rendered
    // tree too so the check can't pass vacuously
    assert(!plan.toString.contains("Exchange"),
      s"assignment must not shuffle the corpus:\n$plan")
  }
}
