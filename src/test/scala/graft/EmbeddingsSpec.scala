package graft

import graft.operators.Embeddings
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  test("random projection: exact, partition-independent, neighbor-preserving") {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(3, 64)(rnd.nextGaussian().toFloat)
    val rows = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val proj = Embeddings.randomProject(df, "vec_id", "embedding", outDim = 16)
      .as[(Long, Int, Double)].collect()

    // identical input vectors project identically, under any partitioning
    val proj2 = Embeddings.randomProject(df.repartition(13), "vec_id", "embedding", 16)
      .as[(Long, Int, Double)].collect()
    assert(proj.sortBy(r => (r._1, r._2)).toSeq == proj2.sortBy(r => (r._1, r._2)).toSeq)

    // JL property on clustered data: every vector's nearest neighbor in
    // the 16-dim projected space belongs to the same CLUSTER as in the
    // 64-dim original (weaker than exact-neighbor, which even JL only
    // gives in distribution — cluster identity is what ANN bucketing uses)
    val full = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    val low = proj.groupBy(_._1).map { case (id, rs) =>
      id -> rs.sortBy(_._2).map(_._3).toArray
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    def nn(space: Map[Long, Array[Double]], id: Long): Long =
      space.filter(_._1 != id).maxBy { case (_, v) => cos(space(id), v) }._1
    val agree = (0L until 90L).count(id => nn(full, id) % 3 == nn(low, id) % 3)
    assert(agree >= 85, s"projected-space neighbors changed cluster: $agree/90 agree")
  }

  test("codegen'd SignProject kernel equals the HOF formula, ties included") {
    // negative exact-half grid points are where Math.round-style kernels
    // diverge from Spark/DuckDB half-away-from-zero: -0.0000005f etc.
    val tricky = Seq(-0.0000005f, 0.0000005f, -1.5e-6f, 0.25f, -0.125f)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      (i.toLong, (tricky ++ Array.fill(59)(rnd.nextGaussian().toFloat * 0.5f)).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    def sign(i: Column, j: Column): Column =
      lit(1L) - lit(2L) * pmod(pmod((i + 13L) * (j + 101L) * 2654435761L, lit(2147483647L)), lit(2L))
    val hof = df.select(col("vec_id"),
      posexplode(transform(sequence(lit(0), lit(15)), j =>
        aggregate(
          zip_with(
            transform(col("embedding"), v => round(v.cast("double") * 1000000d).cast("long")),
            sequence(lit(0), size(col("embedding")) - 1),
            (q, i) => q * sign(i.cast("long"), j.cast("long"))),
          lit(0L), (acc, x) => acc + x).cast("double") / 1000000d))
        .as(Seq("dim0", "val")))
      .select(col("vec_id"), (col("dim0") + 1).as("dim"), col("val"))
      .as[(Long, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val kernel = Embeddings.randomProject(df, "vec_id", "embedding", 16)
      .as[(Long, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(kernel == hof)
  }

  test("centroid shuffle carries scalars, not vectors (explode-first)") {
    val emb = Seq((1L, Seq(1.0f, 2.0f), 0)).toDF("vec_id", "embedding", "label")
    val plan = Embeddings.classCentroids(emb).queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("array<"), s"vector rides a shuffle:\n$exchanges")
  }
}
