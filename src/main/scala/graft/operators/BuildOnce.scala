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
  * == CONCURRENCY ==
  * `computeIfAbsent` only INSTALLS a lazy cell; the Spark build itself
  * runs AFTER the map operation returns (r12 verdict #1: running a
  * minutes-long index build inside the `ConcurrentHashMap` mapping
  * function held the bin lock for its whole duration, serializing
  * unrelated same-stripe cache operations, and a build closure that
  * re-entered the cache was undefined behavior per the CHM contract).
  * Concurrent same-key callers race to install ONE cell and then
  * memoize on its monitor — exactly one build runs, every caller gets
  * its value. Different keys build fully concurrently. A build closure
  * may now re-enter the cache for a DIFFERENT key (well-defined — no map
  * lock is held); SAME-key recursion remains a caller bug and
  * self-deadlocks on the cell's initializer, as any self-referential
  * memoization must.
  *
  * == EVICTION ==
  * A dead session cannot clean up its own artifacts, so every call reaps
  * entries of stopped sessions with the CALLING session — but an
  * artifact is only deleted when NO live entry references the same
  * artifact id (r11 ADVICE: paths are caller-derived and shared across
  * sessions in one JVM, so a stopped session's reap used to delete the
  * artifact out from under a live session's still-cached handle). A live
  * entry protects its id from the INSTALL instant, before its build has
  * produced anything — callers that know the output path up front pass
  * `intendedId`, so a dead session's same-path artifact cannot be reaped
  * mid-build of the live one (r13 ADVICE: deriving ids only from BUILT
  * values left the in-flight window unprotected). Reap DECISIONS and
  * installs are serialized on the cache monitor, but the deletes
  * themselves run OUTSIDE it with their ids tombstoned (r14: a slow
  * delete under the monitor blocked every unrelated same-cache install
  * for its duration) — an install naming a tombstoned id waits for the
  * delete to finish, so a racing caller still can never build into a dir
  * another caller is deleting (r13 verdict #2 — the
  * weakly-consistent-iterator race — stays closed). A dead session's
  * cell whose build never COMPLETED has nothing provably on disk to reap
  * — its entry is dropped and any partial output is left to the
  * artifact's own overwrite/heal discipline.
  *
  * == CROSS-JVM ==
  * This cache is JVM-local by construction (it holds live object
  * handles). Path-addressed callers (`Pq`/`Bm25.writeIndexOnce`) close
  * the cross-JVM gap by running their build closure under
  * [[graft.sources.BuildLock]]: same-path builders in separate JVMs
  * serialize on a create-exclusive lease, and the loser reads the
  * winner's completed artifact instead of rebuilding over it. The
  * table-addressed caller (`Graph.bucketedEdgeTableOnce`) needs no
  * lease — fresh UUID names cannot collide, and session catalogs do not
  * span JVMs (see its scaladoc).
  *
  * == SUPERSEDED VERSIONS (r13 verdict #3) ==
  * Fingerprinted callers version their keys (`<bare>#<digest>`) and
  * their artifact paths ([[BuildOnce.versionedPath]] siblings). Without
  * in-session GC, a long-lived ingest session over a daily-mutating
  * corpus accumulates one abandoned version dir per day — reaping only
  * triggered on session DEATH. Callers therefore pass `supersedes` (the
  * bare key prefix, `<bare>#`): when this call's build completes, OTHER
  * same-session entries under the same prefix are evicted and their
  * artifacts deleted — unless some remaining entry (any session) still
  * references the same artifact id. Another live session's older-version
  * handle keeps both its entry and its dir; the CALLER's own older
  * handles are superseded by definition (the fingerprint comes from
  * current content — no caller can ever ask for the old digest again).
  */
private[graft] final class BuildOnce[V](
    scope: String,
    reap: (SparkSession, V) => Unit,
    artifactId: V => String,
    isDead: SparkSession => Boolean = _.sparkContext.isStopped) {

  /** One cache slot: `value` memoizes the build (evaluated lazily —
    * OUTSIDE the map lock), `maybeValue` exposes it only once built
    * (reaping must never force a build to decide what to delete),
    * `intendedId` protects the output path from install time.
    */
  private final class Cell(
      val params: String, val intendedId: Option[String], thunk: () => V) {
    // install order, for the supersede direction (see reapSuperseded):
    // of two concurrent content versions, only the LATER-installed one
    // may reap the other — without an order, racing versions reap each
    // other and the survivor's handle points at a deleted artifact
    val seq: Long = installSeq.incrementAndGet()
    @volatile private var built: Option[V] = None
    lazy val value: V = { val v = thunk(); built = Some(v); v }
    def maybeValue: Option[V] = built
  }

  private val installSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def idOf(c: Cell): Option[String] =
    c.maybeValue.map(artifactId).orElse(c.intendedId)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Cell]()

  /** Artifact ids whose delete is IN FLIGHT (decided under the monitor,
    * executing outside it). An install naming a tombstoned id waits for
    * the delete to finish — that is the whole no-delete-under-build
    * guarantee, now kept without holding the monitor across the delete
    * itself (r14 residue (b): a slow artifact delete — Graph's DROP
    * TABLE, a big version dir — used to block every unrelated same-cache
    * install for its full duration). Guarded by `this`.
    */
  private val reaping = scala.collection.mutable.Set.empty[String]

  def getOrBuild(spark: SparkSession, key: String, params: String,
      build: => V,
      intendedId: Option[String] = None,
      supersedes: Option[String] = None): V = {
    // reap DECISION + install under ONE monitor acquisition: a concurrent
    // caller's decision either runs before this install (tombstoning the
    // dead artifact's id — this caller then waits out the delete and
    // builds fresh) or after it (and sees this cell's intendedId among
    // the live ids). The delete EXECUTION and the build both run outside
    // — only map surgery and tombstone bookkeeping happen under the lock.
    val (cell, victims) = synchronized {
      while (intendedId.exists(reaping.contains)) wait()
      val vs = collectDead(spark)
      val c = entries.computeIfAbsent(
        (spark, key), _ => new Cell(params, intendedId, () => build))
      (c, vs)
    }
    runReaps(spark, victims)
    require(cell.params == params,
      s"$scope: cache hit for key '$key' built with params [${cell.params}] " +
        s"but requested [$params] — the artifact does not match the " +
        "arguments. Use one parameter set per key, or fold the params " +
        "into the key/path.")
    val v = cell.value
    supersedes.foreach(reapSuperseded(spark, _, key, cell))
    v
  }

  /** Evict the CALLING session's other entries under `keyPrefix` (older
    * content versions of the same bare key) and delete their artifacts —
    * unless a surviving entry still references the same artifact id.
    * Deletes run outside the monitor (tombstoned like [[collectDead]]'s).
    *
    * Two concurrency rules keep racing content versions from destroying
    * each other (two threads of one session fingerprinting a mutating
    * corpus — the documented DAG + live-stream pairing):
    *  - only entries installed BEFORE the caller's own cell are
    *    candidates (`seq` order): the racer that installed later owns
    *    the GC, so the earlier finisher can never delete the later
    *    version's artifact out from under its live handle;
    *  - an UNBUILT (in-flight) candidate is skipped entirely — its entry
    *    stays, keeping its intendedId visible to [[collectDead]] (the
    *    no-delete-under-build guarantee) and its eventual artifact
    *    reachable for the NEXT version's GC pass once it finishes.
    */
  private def reapSuperseded(
      caller: SparkSession, keyPrefix: String, currentKey: String,
      ownCell: Cell): Unit = {
    val victims: Seq[V] = synchronized {
      val superseded = entries.asScala.filter { case ((s, k), c) =>
        (s eq caller) && k != currentKey && k.startsWith(keyPrefix) &&
          c.seq < ownCell.seq && c.maybeValue.isDefined
      }.toSeq
      if (superseded.isEmpty) return
      val victimKeys = superseded.map(_._1).toSet
      val stillReferenced = entries.asScala.collect {
        case (k, c) if !victimKeys.contains(k) => idOf(c)
      }.flatten.toSet
      val out = Seq.newBuilder[V]
      superseded.foreach { case (k, c) =>
        entries.remove(k)
        c.maybeValue.foreach { v =>
          val id = artifactId(v)
          if (!stillReferenced.contains(id) && !reaping.contains(id)) {
            reaping += id
            out += v
          }
        }
      }
      out.result()
    }
    runReaps(caller, victims)
  }

  /** Remove dead sessions' entries and return the values whose artifacts
    * this caller must delete, their ids tombstoned. Callers hold the
    * monitor (getOrBuild's synchronized block); the ids stay tombstoned
    * until the caller's [[runReaps]] clears them.
    */
  private def collectDead(caller: SparkSession): Seq[V] = {
    val liveIds = entries.asScala.collect {
      case ((s, _), c) if !isDead(s) => idOf(c)
    }.flatten.toSet
    val victims = Seq.newBuilder[V]
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (isDead(e.getKey._1)) {
        e.getValue.maybeValue.foreach { v =>
          val id = artifactId(v)
          // an id already in `reaping` is being deleted by another caller
          // right now — claiming it twice would double-delete
          if (!liveIds.contains(id) && !reaping.contains(id)) {
            reaping += id
            victims += v
          }
        }
        it.remove()
      }
    }
    victims.result()
  }

  /** Run the reap callback for each claimed victim OUTSIDE the monitor,
    * then clear the tombstones and wake installers waiting on them. The
    * clear is unconditional (finally): a failed delete must not leave a
    * tombstone that hangs every future same-path install — the artifact's
    * own overwrite/heal discipline owns that debris.
    */
  private def runReaps(caller: SparkSession, victims: Seq[V]): Unit = {
    if (victims.isEmpty) return
    try victims.foreach { v =>
      try reap(caller, v)
      catch { case err: Throwable =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"$scope: could not reap artifact ${artifactId(v)}: $err")
      }
    } finally synchronized {
      victims.foreach(v => reaping -= artifactId(v))
      notifyAll()
    }
  }
}

private[graft] object BuildOnce {
  /** A one-scan content digest — (row count, order-independent but
    * MULTIPLICITY-SENSITIVE hash fold over `idExpr`) — for callers that
    * opt into content-checked keys: append it to the cache key and a
    * mutated-but-same-path corpus becomes a cache MISS (rebuild) instead
    * of a silent stale serve. The fold is `sum(xxhash64(...))` in
    * unbounded decimal, not `bit_xor` (r12 ADVICE: xor cancels rows with
    * even multiplicity, so {A,X,X} and {A,Y,Y} digested equal — exactly
    * the duplicated-row mutations a dedup-oriented corpus sees); sum is
    * order-independent and counts every copy, and decimal(38,0) cannot
    * overflow at any real corpus size (2^63 × 10^15 rows < 10^34).
    * Costs one aggregation scan per call, which is why it is a flag and
    * not the default (the amortization exists to avoid per-call corpus
    * scans).
    */
  def fingerprint(df: DataFrame, idExpr: String): String = {
    val zero = lit(0).cast("decimal(38,0)")
    val row = df.agg(
      count(lit(1)).as("n"),
      coalesce(sum(expr(s"cast(xxhash64($idExpr) as decimal(38,0))")), zero)
        .as("h"))
      .collect().head
    s"n=${row.getLong(0)},h=${row.getDecimal(1).toBigInteger.toString(16)}"
  }

  /** A filesystem-safe SIBLING path for one content version of an
    * artifact: fingerprinted build-once callers write each digest's build
    * at its OWN path instead of overwriting the shared bare path (r12
    * ADVICE: rebuild-at-the-bare-path left earlier cached handles'
    * in-memory stats — n, tt, centroids — aliasing the NEW on-disk data,
    * silently wrong scores on a corpus-A-again call). Versions coexist on
    * disk and reap independently by artifact id. A sibling, not a child:
    * nesting version dirs under the bare path would corrupt a
    * trusting-mode read of that same path.
    */
  def versionedPath(path: String, fp: String): String =
    path.stripSuffix("/") + ".fp-" + fp.replaceAll("[^0-9a-zA-Z]", "_")

  /** The cache key of one content version of `bare`, and the prefix its
    * builds pass as `supersedes`. The separator is deliberately not a
    * lone `#`: supersede matching is by prefix, and a caller-chosen bare
    * key that merely STARTS with another caller's bare-plus-`#` (the
    * documented "fold the date into the key" pattern, e.g. `edges#2026-
    * 08-15` vs fingerprinted `edges`) would be evicted — and its live
    * artifact dropped — as if it were an old content version. Every
    * fingerprinted caller must build keys through these two, never by
    * hand.
    */
  def versionKey(bare: String, fp: String): String = s"$bare#v=$fp"
  def supersedesPrefix(bare: String): String = s"$bare#v="

  /** Reap callback that deletes a local artifact directory. */
  def deleteDir(path: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
}
