package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The session-scoped build-once amortization shared by every persisted
  * in-query artifact — the pagerank bucketed edge table
  * ([[Graph.bucketedEdgeTableOnce]]), the IVF-PQ ANN index
  * ([[Pq.writeIndexOnce]]) and the BM25 posting index
  * ([[Bm25.writeIndexOnce]]). One implementation so the reaping rules and
  * the key contract live in exactly one place (r11 verdict #8: three
  * verbatim copies of the same ConcurrentHashMap loop had already drifted
  * on the eviction-safety rule ADVICE flagged).
  *
  * == KEY CONTRACT ==
  * The cache trusts the key COMPLETELY — it never fingerprints the input
  * frame. Two different corpora (or a corpus mutated between calls)
  * sharing one key in one session will silently serve the FIRST build
  * forever. The key must identify the artifact's CONTENT, not the query:
  * fold in everything the build derives from (source directory,
  * snapshot/batch id), and mint a NEW key when the underlying data
  * changes. Same-key-different-content is a caller bug this API cannot
  * detect — unless the caller opts into [[fingerprint]] (below), which
  * folds a one-scan content digest into the key at the price of that scan
  * per call.
  *
  * == BUILD PARAMETERS ==
  * `params` is the render of every build argument that shapes the
  * artifact (bucket count, nlist, …). A cache hit whose stored params
  * differ from the requested ones fails loudly instead of silently
  * serving the first build's artifact under the wrong knobs (r11 ADVICE:
  * `writeIndexOnce(path, buckets = 128)` after `buckets = 64` returned
  * the 64-bucket index with no warning).
  *
  * == EVICTION ==
  * A dead session cannot clean up its own artifacts, so every call reaps
  * entries of stopped sessions with the CALLING session — but an
  * artifact is only deleted when NO live entry references the same
  * artifact id (r11 ADVICE: paths are caller-derived and shared across
  * sessions in one JVM, so a stopped session's reap used to delete the
  * artifact out from under a live session's still-cached handle).
  */
private[graft] final class BuildOnce[V](
    scope: String,
    reap: (SparkSession, V) => Unit,
    artifactId: V => String) {

  private val entries = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, V)]()

  def getOrBuild(spark: SparkSession, key: String, params: String,
      build: => V): V = {
    reapDead(spark)
    val cell = entries.computeIfAbsent((spark, key), _ => (params, build))
    require(cell._1 == params,
      s"$scope: cache hit for key '$key' built with params [${cell._1}] " +
        s"but requested [$params] — the artifact does not match the " +
        "arguments. Use one parameter set per key, or fold the params " +
        "into the key/path.")
    cell._2
  }

  private def reapDead(caller: SparkSession): Unit = {
    val liveIds = entries.asScala.collect {
      case ((s, _), (_, v)) if !s.sparkContext.isStopped => artifactId(v)
    }.toSet
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) {
        val v = e.getValue._2
        if (!liveIds.contains(artifactId(v))) {
          try reap(caller, v)
          catch { case err: Throwable =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"$scope: could not reap evicted artifact ${artifactId(v)}: $err")
          }
        }
        it.remove()
      }
    }
  }
}

private[graft] object BuildOnce {
  /** A one-scan content digest — (row count, order-independent xxhash64
    * fold over `idExpr`) — for callers that opt into content-checked keys:
    * append it to the cache key and a mutated-but-same-path corpus becomes
    * a cache MISS (rebuild) instead of a silent stale serve. Costs one
    * aggregation scan per call, which is why it is a flag and not the
    * default (the amortization exists to avoid per-call corpus scans).
    */
  def fingerprint(df: DataFrame, idExpr: String): String = {
    val row = df.agg(
      count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(xxhash64($idExpr))"), lit(0L)).as("h"))
      .collect().head
    s"n=${row.getLong(0)},h=${java.lang.Long.toHexString(row.getLong(1))}"
  }

  /** Reap callback that deletes a local artifact directory. */
  def deleteDir(path: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
}
