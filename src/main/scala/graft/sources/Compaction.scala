package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for partitioned parquet tables — the maintenance
  * job every long-running ingest needs: streaming/CDC writers
  * ([[PartitionedUpsert]], `StreamUpsert`, micro-batch appends) leave
  * partitions with many KB-sized files, and at 100 TB the resulting
  * NameNode/listing pressure and per-file open cost dominate scans long
  * before the bytes do.
  *
  * `compact` walks the table's partition directories (driver-side listing,
  * bounded by file count — the same metadata a scan would list anyway),
  * picks partitions whose file count and mean file size cross the
  * thresholds, and rewrites JUST those partitions to
  * `ceil(bytes / targetFileBytes)` files via a pruned read + dynamic
  * partition overwrite. Content is untouched (row-identical,
  * spec-asserted); untouched partitions' files are never rewritten.
  */
object Compaction {

  /** One partition's file stats. */
  final case class PartitionStats(
      partition: String, nFiles: Int, totalBytes: Long)

  /** List (partition value → stats) for a `partitionCol=value`-laid-out
    * table. Driver-side FS metadata walk, no data read.
    */
  def stats(
      spark: SparkSession, tablePath: String,
      partitionCol: String): Seq[PartitionStats] = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(tablePath)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      .map { dir =>
        val files = fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartitionStats(
          dir.getPath.getName.stripPrefix(s"$partitionCol="),
          files.size, files.map(_.getLen).sum)
      }
  }

  /** Compact partitions with more than `maxFiles` files AND mean file size
    * under `smallFileBytes`. Returns the rewritten partition values.
    */
  def compact(
      spark: SparkSession, tablePath: String, partitionCol: String,
      maxFiles: Int = 8, smallFileBytes: Long = 32L << 20,
      targetFileBytes: Long = 128L << 20): Seq[String] = {
    import spark.implicits._
    val victims = stats(spark, tablePath, partitionCol).filter(p =>
      p.nFiles > maxFiles && p.totalBytes / math.max(p.nFiles, 1) < smallFileBytes)
    if (victims.isEmpty) return Seq.empty
    val parts = victims.map(_.partition)
    // target file count PER partition (a 10 GB partition must not collapse
    // to one file): salt each row by hash mod that count, shuffle on
    // (partition, salt) — each combination becomes ~one output file
    val targets = victims.map(p => (p.partition,
      math.max(1L, math.ceil(p.totalBytes.toDouble / targetFileBytes).toLong)))
      .toDF("__part", "__nfiles")
    val slice = spark.read.parquet(tablePath)
      .filter(col(partitionCol).cast("string").isin(parts: _*))
    val dataCols = slice.columns.filterNot(_ == partitionCol).map(col)
    val compacted = slice
      .join(broadcast(targets), col(partitionCol).cast("string") === col("__part"))
      .withColumn("__salt", pmod(xxhash64(struct(dataCols: _*)), col("__nfiles")))
      .repartition(col(partitionCol), col("__salt"))
      .drop("__part", "__nfiles", "__salt")
      .localCheckpoint() // cut the read-overwrite cycle (PartitionedUpsert note)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try compacted.write.mode("overwrite").partitionBy(partitionCol).parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    parts
  }

  /** Compact a FLAT (unpartitioned) append-only parquet dir — the minhash
    * `neardup_index`'s `bands/` and `shingles/` shape (r11 verdict #5:
    * every other warehouse artifact had a compaction owner; these append
    * one small file set per day forever). Same thresholds as [[compact]];
    * returns true iff a rewrite happened.
    *
    * The rewrite is STAGED next to the dir and swapped in by rename (the
    * `Pq.rebuildIfDrifted` discipline): content lands complete in
    * `<dir>.compact.staged` + a `_swap_ready` sentinel, the live dir
    * moves aside to `<dir>.compact.old`, the stage renames in, the old
    * copy is deleted. No crash instant leaves the dir half-rewritten;
    * [[healCompactFlat]] finishes (any caller) or discards (writer only)
    * an interrupted swap.
    *
    * == CONCURRENCY CONTRACT (r12 verdict #5 / ADVICE) ==
    * At most ONE compactFlat may run per dir at a time — the caller owns
    * that exclusion (LlmIngestDag: one `compact_neardup_index` /
    * `compact_media_index` task per day, ordered after the day's grow
    * task). Concurrent READERS are safe: between the two renames the live
    * dir is transiently absent, but the stage is already sealed, so a
    * reader that heals ([[healCompactFlat]] in its default reader mode —
    * `StreamNearDup.load`, `StreamFingerprint` probes) either still sees
    * the old live dir or COMPLETES the swap itself and reads the
    * compacted content; it never deletes a stage (the r12 ADVICE race:
    * a reader-side delete of a mid-write stage let the writer's sentinel
    * recreate an empty stage and install it over live data). Both
    * renames are result-checked — a failed swap aborts loudly with the
    * live content intact (possibly restored from the moved-aside copy),
    * never half-installed.
    */
  def compactFlat(
      spark: SparkSession, dirPath: String,
      maxFiles: Int = 8, smallFileBytes: Long = 32L << 20,
      targetFileBytes: Long = 128L << 20): Boolean = {
    healCompactFlat(spark, dirPath, writer = true)
    val dir = new Path(dirPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return false
    val files = fs.listStatus(dir).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    if (files.size <= maxFiles
        || bytes / math.max(files.size, 1) >= smallFileBytes) return false
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val staged = new Path(stagedFlat(dirPath))
    val old = new Path(oldFlat(dirPath))
    fs.delete(staged, true)
    fs.delete(old, true)
    spark.read.parquet(dirPath).repartition(nOut)
      .write.mode("overwrite").parquet(staged.toString)
    fs.create(new Path(staged, SwapReady), true).close()
    if (!fs.rename(dir, old)) {
      // live dir untouched — discard the stage and fail loudly rather
      // than proceed into a swap whose first half already failed
      fs.delete(staged, true)
      throw new IllegalStateException(
        s"compactFlat: could not move $dirPath aside; live dir intact, stage discarded")
    }
    if (!fs.rename(staged, dir) && !fs.exists(dir)) {
      // swap-in failed AND nobody (e.g. a concurrent reader's heal)
      // completed it — restore the moved-aside copy so the dir is never
      // left absent
      if (!fs.rename(old, dir))
        throw new IllegalStateException(
          s"compactFlat: swap-in and restore both failed for $dirPath; " +
            s"sealed stage remains at $staged — the next heal completes it")
      fs.delete(staged, true)
      throw new IllegalStateException(
        s"compactFlat: swap-in failed for $dirPath; live dir restored")
    }
    fs.delete(new Path(dir, SwapReady), false)
    fs.delete(old, true)
    true
  }

  private def stagedFlat(dirPath: String) =
    dirPath.stripSuffix("/") + ".compact.staged"
  private def oldFlat(dirPath: String) =
    dirPath.stripSuffix("/") + ".compact.old"
  private val SwapReady = "_swap_ready"

  /** Finish (any caller) or discard (writer only) an interrupted
    * [[compactFlat]] swap. The one action safe from EVERY caller is
    * COMPLETING a sealed swap: stage sealed + live dir ABSENT (crash —
    * or a concurrent writer — between the two renames) → rename the
    * stage in. Everything destructive is gated on `writer = true`
    * (r12 ADVICE: `StreamNearDup.load` healing on every micro-batch
    * used to delete ANY stage while the live dir existed — including
    * one a concurrent nightly compactFlat was still writing, whose
    * sentinel then recreated an empty stage and the swap installed it
    * over the live index): stage present + live dir present (crash
    * before the move-aside, or an unsealed stage) → writer drops the
    * stage, readers leave it; a leftover moved-aside copy (crash before
    * its delete) → writer drops it, readers leave it. Readers therefore
    * never destroy data; at worst stale debris waits for the next
    * writer pass.
    */
  def healCompactFlat(
      spark: SparkSession, dirPath: String, writer: Boolean = false): Unit = {
    val dir = new Path(dirPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(stagedFlat(dirPath))
    val old = new Path(oldFlat(dirPath))
    if (fs.exists(staged)) {
      val ready = fs.exists(new Path(staged, SwapReady))
      if (ready && !fs.exists(dir)) {
        // racing healers are benign: the loser's rename fails with the
        // dir already installed by the winner
        if (!fs.rename(staged, dir))
          require(fs.exists(dir),
            s"healCompactFlat: completing rename failed for $dirPath " +
              "and no live dir exists — filesystem refused the swap")
        fs.delete(new Path(dir, SwapReady), false)
      } else if (writer) fs.delete(staged, true)
    }
    if (writer && fs.exists(old) && fs.exists(dir)) fs.delete(old, true)
  }
}
