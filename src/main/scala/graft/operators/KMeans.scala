package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column (SURVEY §2 q86) —
  * the clustering stage under semantic dedup (SemDeDup), IVF coarse
  * quantizers, and topic-balanced mixture design. Unsupervised sibling of
  * q43 (given-label centroids) and q27 (sampled IVF centroids).
  *
  * Everything runs on the 6-dp LONG GRID (the q63/q75 discipline):
  * `v6 = round(v·10⁶)` once per vector, so squared distances are EXACT
  * integer sums (64 dims × (1.1·10⁶)² ≲ 10¹⁴ ≪ 2⁶³ — no float
  * accumulation order to disagree on), assignment is argmin over exact
  * longs with a smallest-cluster tiebreak, and the centroid update
  * re-rounds the per-dimension mean back onto the grid
  * (`round(Σv6/n)` HALF_UP — identical in Spark and ANSI SQL). Every
  * iteration is therefore a pure function of the input multiset: engine-,
  * partitioning- and run-independent, so an unrolled SQL twin reproduces
  * the clustering hash-exactly.
  *
  * Determinism choices, explicitly:
  *   - init = the vectors of the `k` SMALLEST ids (at scale: a bounded
  *     ids-only top-k + semi-join, never a sort of the corpus). k-means‖
  *     or random-restart init is statistically better but engine-random;
  *     a pinned init is what makes the operator auditable, and quality
  *     can be bought back with more iterations.
  *   - distance ties take the SMALLEST cluster id (argmin = first index
  *     of the min — `array_position(dists, array_min(dists))`).
  *   - a cluster that loses every member KEEPS its previous centroid
  *     (never NaN, never a row-count change mid-query).
  *
  * Scale shape (100 TB): per iteration, assignment is a SCAN — centroids
  * live in the plan as k×d literals (k·d ≤ a few thousand: the same
  * "model broadcasts, corpus never shuffles" rule as q84's NB model), and
  * the update shuffles only (cluster, dim, partial long sum) — map-side
  * combine reduces it to k·d rows per partition; the driver ever holds
  * k×d longs. The quantized corpus is materialized once
  * (`localCheckpoint` locally; a persisted table on a cluster) so
  * `iters`+1 passes don't re-read + re-quantize the source.
  *
  * Returns one row per vector: (id, cluster, dist_sq) where dist_sq is
  * the exact grid distance scaled back to input units (÷10¹², 6 dp).
  */
object KMeans {

  /** Squared L2 distance between the grid vector column and a centroid
    * literal — an exact integer fold, codegen'd HOFs only.
    */
  private def distSq(v6: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(v6, array(c.map(lit).toSeq: _*), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Quantize the vector column onto the 6-dp long grid. */
  private def quantize(
      emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb
      .filter(col(vecCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => round(x.cast("double") * lit(1e6), 0).cast("long"))
          .as("v6"))

  /** Assign (id, vector) rows to FIXED grid centroids — the model-SERVING
    * path: a pure per-row expression (centroids as literals), no shuffle,
    * no state, so it runs unchanged over a stream
    * ([[graft.streaming.StreamCluster]]) or any batch frame. Returns
    * (id, cluster, dist_sq) with [[cluster]]'s exact semantics.
    */
  def assignTo(
      df: DataFrame, centroids: Array[Array[Long]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    // the k×d distance kernel runs in the scan stage; spread a narrow
    // batch input first (guide §2.5 — no-op on streams and wide scans)
    quantize(Spread.ifNarrow(df), idCol, vecCol)
      .withColumn("dists", array(centroids.toSeq.map(distSq(col("v6"), _)): _*))
      .select(
        col("id"),
        (array_position(col("dists"), array_min(col("dists"))) - 1)
          .cast("int").as("cluster"),
        round(array_min(col("dists")).cast("double") / lit(1e12), 6)
          .as("dist_sq"))
  }

  /** Run the Lloyd loop and return the trained GRID centroids (k×d longs,
    * driver-side) — the model [[assignTo]] serves. See [[cluster]] for
    * the full semantics; this is its training half.
    */
  def trainCentroids(
      emb: DataFrame, k: Int = 8, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Long]] = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")

    // spread BEFORE the checkpoint: every Lloyd iteration re-scans this
    // frame with the k×d distance kernel, so a one-file input would pin
    // all of them to one task (guide §2.5; measured two 0.9 s single-task
    // iteration jobs in q93)
    val quantized = quantize(Spread.ifNarrow(
      emb.select(col(idCol), col(vecCol))), idCol, vecCol).localCheckpoint()

    // Seed centroids: vectors of the k smallest ids, cluster j = rank.
    var centroids: Array[Array[Long]] = quantized
      .orderBy(col("id")).limit(k)
      .collect()
      .map(_.getSeq[Long](1).toArray)
    require(centroids.nonEmpty, "empty input")

    // one scan computes the assignment NEXT TO the vector — the update
    // must never re-join assignment to vectors by id (that join is a
    // full-corpus shuffle per iteration at scale)
    def assigned(cs: Array[Array[Long]]): DataFrame =
      quantized
        .withColumn("dists", array(cs.toSeq.map(distSq(col("v6"), _)): _*))
        .withColumn("cluster",
          (array_position(col("dists"), array_min(col("dists"))) - 1)
            .cast("int"))
        .withColumn("d", array_min(col("dists")))

    for (_ <- 0 until iters) {
      // (cluster, dim) long partial sums; mean re-rounded onto the grid
      // IN the aggregation so the driver only ever sees k×d final longs.
      val updated = assigned(centroids)
        .select(col("cluster"), posexplode(col("v6")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(round(sum(col("v")).cast("double") / count(lit(1)), 0)
          .cast("long").as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cl, rows) =>
          cl -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray
        }
      // empty cluster -> keep the previous centroid
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        updated.getOrElse(j, old)
      }
    }

    centroids
  }

  def cluster(
      emb: DataFrame, k: Int = 8, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignTo(emb, trainCentroids(emb, k, iters, idCol, vecCol), idCol, vecCol)

  /** Cluster DIAGNOSTICS over [[cluster]]'s assignment (SURVEY §2 q93):
    * per cluster, its size, mean squared distance (compactness — the
    * per-cluster inertia an elbow analysis reads), majority label and
    * purity (agreement with an external labeling — the standard external
    * clustering-quality check). Everything downstream of the assignment
    * is k×|labels|-sized: the label histogram reduces with map-side
    * combine, the majority pick is a window over k×|labels| rows, and
    * the mean accumulates the 6-dp dist_sq as DECIMAL (order-independent)
    * before one rounded double division. Returns
    * (cluster, n_vectors, mean_dist_sq, majority_label, purity).
    */
  def clusterProfile(
      emb: DataFrame, k: Int = 8, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = cluster(emb, k, iters, idCol, vecCol)
    val j = a.join(
      emb.filter(col(vecCol).isNotNull)
        .select(col(idCol).cast("long").as("id"), col(labelCol).as("label")),
      "id")
    val sz = j.groupBy(col("cluster")).agg(
      count(lit(1)).as("n_vectors"),
      round(sum(col("dist_sq").cast("decimal(20,6)")).cast("double")
        / count(lit(1)), 6).as("mean_dist_sq"))
    val mj = j.groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("c").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("label").as("majority_label"), col("c"))
    sz.join(mj, "cluster")
      .select(col("cluster"), col("n_vectors"), col("mean_dist_sq"),
        col("majority_label"),
        round(col("c").cast("double") / col("n_vectors"), 4).as("purity"))
  }
}
