package graft.operators

import graft.plans.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic (embedding-space) deduplication scoped WITHIN
  * k-means clusters (SURVEY §2 q87; Abbas et al. 2023, "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication").
  *
  * The point of the clustering is the COST BOUND: brute-force cosine
  * near-dup (q24) is O(n²); clustering first (q86) and comparing only
  * within clusters is O(n²/k) pairs while losing only cross-cluster
  * near-dups — which are rare by construction, because near-identical
  * embeddings land in the same cluster (they are near the same centroid).
  * q24b buys the same bound probabilistically with LSH; SemDeDup's
  * cluster scope additionally yields the cluster structure itself (used
  * for topic balancing) and a tunable, deterministic candidate set.
  *
  * Keep rule (deterministic, one pass — no chain/fixpoint): a vector is
  * DROPPED iff some SMALLER-id vector in its cluster has
  * `round(cos, 4) ≥ tau`; ties and ordering therefore never depend on
  * engine or partitioning (the q24 rounding discipline). Returns the full
  * spine — (id, cluster, is_kept) — so downstream can either filter the
  * survivors or audit the drop rate per cluster.
  *
  * Scale shape (100 TB): the pair join shuffles on `cluster`, so cluster
  * GRANULARITY is the cost knob — size k so n/k ≈ 10⁴ vectors per
  * cluster (SemDeDup used 50k clusters for LAION); per-cluster pair work
  * is then bounded and uniform-ish, and a skewed giant cluster is
  * handled by AQE skew-join splitting or by re-clustering that cluster
  * alone (k-means recursion). The assignment spine is materialized once
  * (`localCheckpoint`) so the a-side, b-side, and output spine don't
  * re-run the final k-means assignment scan.
  */
object SemDedup {

  def semDedup(
      emb: DataFrame, k: Int = 8, iters: Int = 3, tau: Double = 0.4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = KMeans.cluster(emb, k, iters, idCol, vecCol)
      .select(col("id"), col("cluster"))
      .localCheckpoint()
    val v = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .join(assigned, "id")
    val dropped = v.as("a")
      .join(
        v.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id") &&
          round(VectorFunctions.cosineSimilarity(col("a.v"), col("b.v")), 4)
            >= lit(tau))
      .select(col("b.id").as("id"))
      .distinct()
    assigned
      .join(dropped.withColumn("dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"), col("dup").isNull.as("is_kept"))
  }
}
