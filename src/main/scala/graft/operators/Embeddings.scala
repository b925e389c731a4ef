package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension-wise aggregation over embedding columns. */
object Embeddings {

  /** Per-class centroids of an `array<float>` embedding column, one output
    * row per (group, dimension) — the corpus statistic behind IVF coarse
    * quantizers, class prototypes, and drift monitors.
    *
    * Shape: posexplode each vector into (group, dim, value) rows, then a
    * plain hash aggregate. The shuffle carries (group, dim, partial sum) —
    * map-side partial aggregation reduces ×(rows/partition), and no task
    * ever holds more than one vector, so a 4k-dim embedding at 100 TB
    * costs bandwidth, not memory. Values accumulate as DECIMAL so the sum
    * (hence the centroid) is independent of partition order — a double
    * sum would drift in the last bits between runs/engines.
    *
    * `dim` is 1-based. Returns (grpCol, dim, centroid, n_vectors).
    */
  def classCentroids(
      emb: DataFrame, grpCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    emb
      .select(col(grpCol), posexplode(col(vecCol)).as(Seq("dim0", "v")))
      .select(
        col(grpCol),
        (col("dim0") + 1).cast("int").as("dim"),
        // float -> double -> decimal: both hops are value-deterministic,
        // and the decimal sum is order-independent
        col("v").cast("double").cast("decimal(20,10)").as("dv"))
      .groupBy(col(grpCol), col("dim"))
      .agg(
        round(sum(col("dv")).cast("double") / count(lit(1)), 6).as("centroid"),
        count(lit(1)).as("n_vectors"))
}
