package graft.streaming

import java.sql.Timestamp

import graft.operators.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One document arrival on the wire: the q110 input grain with the
  * normalized-text digest already attached (build with [[StreamDedupStats.arrivals]]).
  */
case class DocArrival(doc_id: Long, ts: Timestamp, source: String, digest: Long)

/** Per-(window, source) dedup-monitor state: the digests seen so far and
  * the running arrival/duplicate tallies.
  */
case class WindowDigests(digests: Seq[Long], nDocs: Long, nDups: Long)

/** One FINALIZED window's exact-dup observability row — emitted exactly
  * once, when the watermark passes the window end.
  */
case class WindowDedupStats(
    window_start: Timestamp, source: String,
    n_docs: Long, n_exact_dups: Long, exact_dup_rate: Double)

/** Streaming twin of the per-source dedup-rate observability rollup
  * (q110; [[graft.operators.Dedup.dedupStats]]) — the LIVE version of the
  * monitor: a source whose dup rate jumps is a crawler loop or a feed
  * replay NOW, not at the nightly batch.
  *
  * Two halves, mirroring the batch operator's two halves:
  *
  *   - EXACT side ([[windowStats]]): tumbling-window per-source dup rate
  *     via one `flatMapGroupsWithState` keyed by (window, source). State
  *     is the window's digest set — the SAME information StreamDedup's
  *     `dropDuplicatesWithinWatermark` holds per horizon, here grouped so
  *     the rate can be emitted per source ON FINALIZE (event-time
  *     timeout at window end): each window reports exactly once, and the
  *     per-source sum over windows equals the batch rollup whenever
  *     duplicates don't straddle a window boundary (the windowed monitor
  *     contract; the nightly batch q110 stays the source of truth
  *     corpus-wide, the same compromise StreamDedup documents).
  *   - NEAR-DUP side ([[startNearDupMonitor]] / [[applyBatch]]): a
  *     foreachBatch monitor with StreamNearDup's marker/overwrite
  *     delivery protocol, recording the VERIFIED near-dup pair hits of
  *     each micro-batch against a monitor-owned persisted index. Unlike
  *     StreamNearDup's dedup index, the monitor indexes EVERY arrival
  *     (dropped duplicates included) — batch q110 counts a doc as
  *     near-dup if it pairs with ANY doc in the corpus, so the
  *     observability index must keep the full corpus's bands/shingles
  *     (8-byte rows, never text) or chained families (A≈B≈C with A≉C)
  *     would under-count. With every arrival indexed, each batch pair
  *     (i, j) is found exactly once — at the later member's arrival —
  *     so the accumulated hit-id set equals the batch pair-id set.
  *
  * [[rollup]] joins the two halves back into the batch operator's exact
  * output shape; the spec asserts equality with `Dedup.dedupStats` on a
  * fully-delivered single-window stream.
  */
object StreamDedupStats {

  /** Attach the q20/q110 normalized-text digest to a raw doc frame:
    * (tsCol, idCol, textCol, srcCol) → typed [[DocArrival]]s.
    */
  def arrivals(
      spark: SparkSession, docs: DataFrame,
      idCol: String, tsCol: String, textCol: String, srcCol: String): Dataset[DocArrival] = {
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(tsCol).cast("timestamp").as("ts"),
      col(srcCol).as("source"),
      xxhash64(Dedup.normalized(col(textCol))).as("digest"))
      .as[DocArrival]
  }

  /** The ONE finalized-row constructor both the streaming finalize and
    * the batch twin emit through — the rounding/rate formula exists
    * exactly once, so the twins cannot drift.
    */
  private def statsRow(
      ws: Long, src: String, nDocs: Long, nDups: Long): WindowDedupStats =
    WindowDedupStats(
      new Timestamp(ws), src, nDocs, nDups,
      BigDecimal(nDups.toDouble / nDocs)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Fold one micro-batch of a (window, source) group; emit the final
    * stats row when the watermark passes the window end. Duplicate
    * counting is arrival-order-independent: n_exact_dups = arrivals −
    * distinct digests, the batch formula.
    */
  def updateWindow(windowLenMs: Long)(
      key: (Long, String),
      docs: Iterator[DocArrival],
      state: GroupState[WindowDigests]): Iterator[WindowDedupStats] = {
    if (docs.isEmpty && state.hasTimedOut) {
      val out = state.getOption
        .map(s => statsRow(key._1, key._2, s.nDocs, s.nDups)).iterator
      state.remove()
      return out
    }
    var st = state.getOption.getOrElse(WindowDigests(Seq.empty, 0L, 0L))
    var seen = st.digests.toSet
    docs.foreach { d =>
      st = if (seen.contains(d.digest)) st.copy(nDocs = st.nDocs + 1, nDups = st.nDups + 1)
      else {
        seen += d.digest
        st.copy(digests = st.digests :+ d.digest, nDocs = st.nDocs + 1)
      }
    }
    state.update(st)
    state.setTimeoutTimestamp(key._1 + windowLenMs)
    Iterator.empty
  }

  /** Tumbling-window per-source exact-dup rates over a doc-arrival
    * stream; rows emit once per (window, source), on finalize.
    */
  def windowStats(
      spark: SparkSession, docs: Dataset[DocArrival],
      windowLen: java.time.Duration = java.time.Duration.ofHours(1),
      watermarkDelay: String = "10 minutes"): Dataset[WindowDedupStats] = {
    import spark.implicits._
    val lenMs = windowLen.toMillis
    require(lenMs > 0, "windowLen must be positive")
    if (!docs.isStreaming) {
      // batch twin (a backfill recomputing what the stream would have
      // emitted): every window of a batch frame is fully delivered, so
      // every group finalizes immediately. The stateful path would emit
      // NOTHING here — event-time timeouts never fire in batch execution.
      // A plain count/count_distinct aggregation (NOT mapGroups): partial
      // aggregation combines map-side, so a billion-arrival window never
      // funnels full rows through one task, and the emitted row comes
      // from the SAME statsRow the stream's finalize uses.
      return docs.toDF()
        .groupBy(
          (floor(unix_millis(col("ts")) / lenMs) * lenMs).cast("long").as("ws"),
          col("source"))
        .agg(count(lit(1)).as("n"), countDistinct(col("digest")).as("nd"))
        .as[(Long, String, Long, Long)]
        .map { case (ws, src, n, nd) => statsRow(ws, src, n, n - nd) }
    }
    docs.withWatermark("ts", watermarkDelay)
      .groupByKey(d => (Math.floorDiv(d.ts.getTime, lenMs) * lenMs, d.source))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateWindow(lenMs))
  }

  /** Start the near-dup hit monitor: per micro-batch, verified pair hits
    * (delta vs monitor index + within delta) land in
    * `hitsDir/batch=<id>/` and the FULL batch (every arrival) is appended
    * to the monitor index — StreamNearDup's delivery protocol (marker
    * before append; overwrite-per-batch output) so replays are no-ops.
    */
  def startNearDupMonitor(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, hitsDir: String, checkpointDir: String,
      n: Int = 3, threshold: Double = 0.7,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val nHits = applyBatch(
          batch.sparkSession, batch, idCol, textCol,
          indexDir, hitsDir, batchId, n, threshold)
        onBatch(batchId, nHits)
      }
      .start()

  /** One monitor batch (factored out for unit tests). Returns the number
    * of hit PAIRS recorded, or -1 if the batch was already applied.
    */
  def applyBatch(
      spark: SparkSession, batch: DataFrame, idCol: String, textCol: String,
      indexDir: String, hitsDir: String, batchId: Long,
      n: Int = 3, threshold: Double = 0.7): Long = {
    // the monitor index's band/shingle keys are the same pure function
    // of (n, bands, rowsPerBand) as the dedup indexes' — stamp-or-
    // validate so a restarted monitor under different parameters fails
    // loudly instead of silently under-counting near-dups forever
    // (IndexConf doc; this entry point bakes in incrementalNearDup's
    // default banding)
    graft.sources.IndexConf.ensure(spark, indexDir,
      Map("n" -> n.toString, "bands" -> "32", "rowsPerBand" -> "4"),
      "dedup-stats monitor index")
    val conf = spark.sessionState.newHadoopConf()
    val marker = new Path(s"$indexDir/_batches/$batchId")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return -1L

    val empty = Dedup.nearDupIndex(batch.limit(0), idCol, textCol, n)
    def load(sub: String, or: DataFrame): DataFrame = {
      // the monitor index has the same append-forever flat-dir shape as
      // the dedup indexes, so a deployment pointing Compaction.compactFlat
      // at it gets the same reader guarantee: a swap interrupted between
      // its renames must read as the sealed full index, never as "no
      // index yet" (reader mode — completes sealed swaps, deletes nothing)
      graft.sources.Compaction.healCompactFlat(spark, s"$indexDir/$sub")
      val p = new Path(s"$indexDir/$sub")
      if (p.getFileSystem(conf).exists(p)) spark.read.parquet(p.toString) else or
    }
    val index = Dedup.NearDupIndex(
      load("bands", empty.bands), load("shingles", empty.shingles))

    // drop self-pairs: a REPLAYED doc id (a crawler re-fetch in a NEW
    // batch — the marker protocol only skips committed batch ids) matches
    // ITSELF in the index at jaccard 1; the dedup operator rightly DROPS
    // it from survivors, but the monitor must not COUNT the doc as a
    // near-dup of anything
    val hits = Dedup.incrementalNearDup(
      batch, idCol, textCol, index, n, threshold).hits
      .filter(col("id_a") =!= col("id_b"))
      .localCheckpoint()
    // the monitor indexes EVERY arrival, not just survivors (see scaladoc)
    val fullAdd = Dedup.nearDupIndex(batch, idCol, textCol, n)
    val addBands = fullAdd.bands.localCheckpoint()
    val addShingles = fullAdd.shingles.localCheckpoint()

    hits.write.mode("overwrite").parquet(s"$hitsDir/batch=$batchId")
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    addBands.write.mode("append").parquet(s"$indexDir/bands")
    addShingles.write.mode("append").parquet(s"$indexDir/shingles")
    hits.count()
  }

  /** The LIVE half of q118's attribution matrix (r10): roll the
    * monitor's accumulated pair hits up per unordered source pair —
    * who duplicates WHOM, continuously. A new mirror or feed replay
    * shows up as a spiking (src_a, src_b) row between nightly batch
    * runs. Same columns and discipline as
    * [[graft.operators.Dedup.nearDupSourceMatrix]] ('(null)' coalesce,
    * pair-universe rate with the C(n,2) diagonal) MINUS mean_jaccard —
    * the monitor records hit ids, not scores; the spec pins row-for-row
    * equality with the batch matrix's remaining columns on a fully
    * delivered corpus, which is the anti-drift device. `docs` supplies
    * the id → source map AND the per-source universe counts, so pass the
    * corpus the hits accumulated over.
    */
  def sourceMatrixRollup(hits: DataFrame, docs: DataFrame,
      idCol: String, srcCol: String): DataFrame = {
    val src = docs.select(col(idCol).cast("long").as("id"),
      coalesce(col(srcCol), lit("(null)")).as("src"))
    val counts = src.groupBy(col("src")).agg(count(lit(1)).as("n"))
    // two consumers (docs-touched and the pair count) — checkpoint, the
    // nearDupSourceMatrix discipline
    val tagged = hits.select(col("id_a"), col("id_b"))
      .join(src.select(col("id").as("id_a"), col("src").as("sa")), Seq("id_a"))
      .join(src.select(col("id").as("id_b"), col("src").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .localCheckpoint()
    val docsTouched = tagged
      .select(col("src_a"), col("src_b"),
        explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(countDistinct(col("id")).as("n_docs"))
    tagged.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .join(docsTouched, Seq("src_a", "src_b"))
      .join(broadcast(counts.select(col("src").as("src_a"), col("n").as("n_a"))),
        Seq("src_a"))
      .join(broadcast(counts.select(col("src").as("src_b"), col("n").as("n_b"))),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_pairs"), col("n_docs"),
        round(col("n_pairs").cast("double") /
          when(col("src_a") === col("src_b"),
            (col("n_a") * (col("n_a") - 1) / 2).cast("double"))
            .otherwise((col("n_a") * col("n_b")).cast("double")), 8)
          .as("pair_rate"))
  }

  /** Join the two halves back into `Dedup.dedupStats`' exact output
    * shape: `stats` are the finalized [[WindowDedupStats]] rows (summed
    * per source), `hits` the recorded pair hits (read from `hitsDir`),
    * `docs` the id → source map the hit ids resolve against.
    */
  def rollup(stats: DataFrame, hits: DataFrame, docs: DataFrame,
      idCol: String, srcCol: String): DataFrame = {
    val ex = stats.groupBy(col("source")).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_exact_dups")).as("n_exact_dups"))
    val ndIds = hits
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val nd = docs.select(col(idCol).cast("long").as("id"), col(srcCol).as("source"))
      .join(ndIds, Seq("id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_neardup_docs"))
    ex.join(nd, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_exact_dups"),
        coalesce(col("n_neardup_docs"), lit(0L)).as("n_neardup_docs"),
        round(col("n_exact_dups").cast("double") / col("n_docs"), 4)
          .as("exact_dup_rate"),
        round(coalesce(col("n_neardup_docs"), lit(0L)).cast("double")
          / col("n_docs"), 4).as("neardup_rate"))
  }
}
