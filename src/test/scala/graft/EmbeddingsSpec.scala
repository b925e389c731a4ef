package graft

import graft.operators.Embeddings

class EmbeddingsSpec extends SparkTestBase {
  import spark.implicits._

  test("class centroids: per-dimension means, 1-based dims, order-stable") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f), 0), (2L, Seq(3.0f, 4.0f), 0),
      (3L, Seq(10.0f, -2.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Embeddings.classCentroids(emb)
      .as[(Int, Int, Double, Long)].collect().toSet
    assert(out == Set(
      (0, 1, 2.0, 2L), (0, 2, 3.0, 2L),
      (1, 1, 10.0, 1L), (1, 2, -2.5, 1L)))
  }

  test("centroid shuffle carries scalars, not vectors (explode-first)") {
    val emb = Seq((1L, Seq(1.0f, 2.0f), 0)).toDF("vec_id", "embedding", "label")
    val plan = Embeddings.classCentroids(emb).queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("array<"), s"vector rides a shuffle:\n$exchanges")
  }
}
