package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared batch-marker resolution for the two-producer indexes
  * ([[StreamNearDup]] text near-dup, [[StreamFingerprint]] media) — one
  * implementation of "is this batch applied?" so the DAG gates and the
  * apply paths can never drift apart, and the legacy-marker migration
  * rule lives in exactly one place.
  *
  * == Namespaces ==
  * Post-upgrade markers are producer-namespaced: `_batches/mb-<id>` for
  * the live stream's micro-batch counters, `_batches/day-<id>` for the
  * DAG's epoch days. Ids only need to be unique within their producer.
  *
  * == Legacy bare markers (the migration rule) ==
  * A pre-upgrade index carries bare `_batches/<id>` markers from BOTH
  * producers, indistinguishable by value. Re-running an applied batch is
  * catastrophic for these indexes (a day re-run self-hits every doc
  * against its own index keys and empties the survivor set), so existing
  * bare markers must stay honored. But claiming EVERY bare id for every
  * producer forever is not a one-in-N risk — it is systematic: a
  * pre-upgrade stream whose counter reached N has bare markers 0..N, a
  * CONTIGUOUS range, and every future ingest day whose epoch day falls
  * inside it would silently no-op (for `grow_media_index` there is no
  * downstream read to fail loudly — the index just stops growing).
  *
  * The disambiguator is time: a day marker can only exist for a day that
  * has already happened. On first post-upgrade touch, [[legacyBound]]
  * records the CURRENT epoch day in `_batches/_migration`; a bare marker
  * then claims the `day` namespace only for ids ≤ that bound (every
  * legitimate pre-upgrade day marker is ≤ it by definition), so ingest
  * days AFTER the migration are never shadowed, however far the legacy
  * stream counter ran. The `mb` namespace keeps claiming all bare ids:
  * the stream's checkpoint resumes its counter past its own legacy
  * range, so the only residual collision is the stream counter GROWING
  * INTO a sparse pre-upgrade day id (~one bare marker per pre-upgrade
  * ingest day) — bounded, non-systematic, and surfaced as an
  * already-applied no-op; no NEW bare markers accumulate post-upgrade.
  * Deploy both producers' binaries together: an old binary writing bare
  * markers after the sentinel exists would re-widen the ambiguity.
  *
  * The sentinel is one small file; a crash before it commits just
  * recomputes (the bare-marker set is immutable post-upgrade, so the
  * recomputation is deterministic up to the day boundary).
  */
object Markers {

  private[streaming] val MigrationSentinel = "_migration"

  /** True iff `batchId` is applied under `namespace` — the namespaced
    * marker, or a legacy bare marker admissible under the migration rule
    * above.
    */
  def applied(
      spark: SparkSession, indexDir: String, batchId: Long,
      namespace: String): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val marker = new Path(s"$indexDir/_batches/$namespace-$batchId")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return true
    val bare = new Path(s"$indexDir/_batches/$batchId")
    fs.exists(bare) && (namespace != "day" ||
      batchId <= legacyBound(fs, bare.getParent))
  }

  /** The epoch day recorded at migration (first post-upgrade touch of an
    * index that still carries bare markers) — the upper bound on bare
    * ids the `day` namespace honors. Reads the sentinel; writes it with
    * TODAY's epoch day if absent.
    */
  private def legacyBound(fs: FileSystem, batchesDir: Path): Long = {
    val p = new Path(batchesDir, MigrationSentinel)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.trim.toLong
    } else {
      val bound = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toEpochDay
      val out = fs.create(p, true)
      try out.write(bound.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      bound
    }
  }
}
