package graft.operators

import graft.plans.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders}

/** IVF-flat approximate nearest neighbor over an embedding column — the
  * second ANN scale path beside [[Knn.lshTopK]] (SURVEY §2 `q27_knn_ivf`).
  *
  * Classic inverted-file design (the same shape faiss uses):
  *  1. TRAIN: k-means centroids from a bounded sample, on the driver —
  *     training data is O(sampleSize × dim), the full corpus never leaves
  *     executors;
  *  2. ASSIGN: every corpus vector gets its nearest centroid's cell id
  *     (one codegen'd expression, embarrassingly parallel);
  *  3. PROBE: each query scores only vectors in its `nprobe` nearest
  *     cells — the candidate set shrinks by ~nlist/nprobe versus a full
  *     scan, at the cost of recall (rows-only oracle, like q26).
  *
  * The cell assignment is deterministic (seeded sample, fixed iteration
  * count, ties to the lowest cell id).
  */
object IvfKnn {

  /** Driver-side Lloyd iterations over a seeded, id-ordered sample.
    * Cosine metric: all vectors and centroids are L2-normalized, so
    * nearest-by-dot == nearest-by-cosine.
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 10, sampleSize: Int = 4096): Array[Array[Float]] = {
    val sample = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<float>").as("v"))
      .orderBy(col("id"))
      .limit(sampleSize)
      .select(col("v"))
      .collect()
      .map(r => normalize(r.getSeq[Float](0).toArray))
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")

    // init: evenly spaced sample points (deterministic)
    var centroids = Array.tabulate(nlist)(c => sample(c * sample.length / nlist).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(nlist)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else normalize(sums(c).map(x => (x / counts(c)).toFloat))
      }
    }
    centroids
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    v.map(x => (x * inv).toFloat)
  }

  private def nearest(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestDot = Double.MinValue
    var c = 0
    while (c < centroids.length) {
      var dot = 0.0
      var i = 0
      val ctr = centroids(c)
      val n = math.min(v.length, ctr.length)
      while (i < n) { dot += v(i).toDouble * ctr(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** IVF top-k: returns (query_id, rank, neighbor_id), ranks on
    * round(cosine, 6) with id tie-break like [[Knn.bruteForceTopK]].
    */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 32, nprobe: Int = 8): DataFrame = {
    val centroids = trainCentroids(corpus, idCol, vecCol, nlist)
    val cells = (v: org.apache.spark.sql.Column, p: Int) =>
      VectorFunctions.nearestCells(v, centroids, p)

    val c = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      element_at(cells(col(vecCol), 1), 1).as("cell"))
    val probes = queries.select(
      col(idCol).as("qid"), explode(cells(col(vecCol), nprobe)).as("cell"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))

    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    c.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("id"),
        round(VectorFunctions.cosineSimilarity(col("v"), col("qv")), 6).as("score"))
      .groupBy("qid")
      .agg(topk(col("id"), col("score")).as("ids"))
      .select(col("qid").as("query_id"), posexplode(col("ids")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"), col("neighbor_id"))
  }
}
