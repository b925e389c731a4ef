package graft.streaming

import graft.operators.KMeans
import org.apache.spark.sql.DataFrame

/** Streaming TOPIC ROUTING against a trained k-means model — the serving
  * half of [[graft.operators.KMeans]]: centroids are trained offline on
  * the embedding store ([[KMeans.trainCentroids]]) and each incoming
  * vector is assigned to its nearest centroid as it arrives. This is how
  * a corpus pipeline routes fresh documents to topic shards / SemDeDup
  * partitions / IVF cells without re-clustering anything.
  *
  * The assignment is a pure per-row expression (k×d centroid literals in
  * the plan — the stream-static broadcast-model pattern of
  * `EventStream.enriched`, but with no join at all): NO shuffle, NO
  * streaming state, so the query runs in append mode with zero state
  * stores (spec-asserted via `stateOperators.isEmpty`) and scales with
  * scan bandwidth alone. Batch/stream parity is exact by construction —
  * the same [[KMeans.assignTo]] column expressions run in both — and the
  * spec asserts it row for row.
  */
object StreamCluster {

  /** (id, cluster, dist_sq) for each streamed vector; semantics exactly
    * [[KMeans.assignTo]].
    */
  def assignments(
      stream: DataFrame, centroids: Array[Array[Long]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    KMeans.assignTo(stream, centroids, idCol, vecCol)
}
