package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents in a
  * deterministic order and cut every `seqLen` tokens — the step that turns
  * a cleaned corpus into fixed-length training sequences. This computes,
  * per document, its GLOBAL token offset and the sequences it spans
  * (documents straddle cuts, as in real packing), without ever sorting the
  * corpus in one task.
  *
  * The global running sum is a DISTRIBUTED PREFIX SUM, not a
  * single-partition window (the naive `Window.orderBy(id)` with no
  * partition key moves the whole corpus through one task — the classic
  * scale trap Spark warns about):
  *   1. range-bucket by id (`floor(id/W)`, W from one bounded min/max agg
  *      — value-based, so bucketing is deterministic, unlike
  *      repartitionByRange's sampled boundaries);
  *   2. one window per bucket for the within-bucket running sum;
  *   3. bucket totals → driver prefix scan (bounded: one row per bucket)
  *      → broadcast join of each bucket's starting offset.
  * All integer arithmetic — exact on any engine and partitioning.
  *
  * Returns (idCol, n_tokens, offset, start_seq, end_seq, pos_in_seq).
  */
object Packing {

  def tokenOffsets(
      docs: DataFrame, idCol: String, nTokensCol: String, seqLen: Long,
      buckets: Int = 256): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._

    val stats = docs.agg(
      min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
    if (stats.isNullAt(0)) // empty input: empty output, same shape
      return docs
        .select(col(idCol).cast("long").as(idCol),
          col(nTokensCol).cast("long").as("n_tokens"))
        .withColumn("offset", lit(0L))
        .withColumn("start_seq", lit(0L))
        .withColumn("end_seq", lit(0L))
        .withColumn("pos_in_seq", lit(0L))
        .limit(0)
    val (lo, hi) = (stats.getLong(0), stats.getLong(1))
    val width = math.max(1L, (hi - lo) / buckets + 1)

    // integer `div`, not `/`: double division loses exactness past 2^53
    val bucketed = docs.select(
      col(idCol).cast("long").as("id"),
      col(nTokensCol).cast("long").as("n_tokens"),
      expr(s"(CAST(`$idCol` AS BIGINT) - ${lo}L) div ${width}L").as("__b"))
    val w = Window.partitionBy(col("__b")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = bucketed.withColumn("__cum", sum(col("n_tokens")).over(w))

    // bounded driver scan: one partial total per bucket -> start offsets
    val totals = bucketed.groupBy(col("__b")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val starts = totals.toSeq
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).map(w => (w(1)._1, w(0)._2)).toSeq
    val startDf = starts.toDF("__b", "__start")

    within.join(broadcast(startDf), Seq("__b"))
      .select(
        col("id").as(idCol), col("n_tokens"),
        (col("__start") + col("__cum") - col("n_tokens")).as("offset"))
      .withColumn("start_seq", expr(s"offset div ${seqLen}L"))
      .withColumn("end_seq",
        expr(s"(offset + greatest(n_tokens, 1L) - 1) div ${seqLen}L"))
      .withColumn("pos_in_seq", pmod(col("offset"), lit(seqLen)))
  }

  /** Length-bucketed batch assignment (SURVEY §2 q83) — the padding
    * minimizer between chunking (q73) and packing (q64): where packing
    * concatenates documents into fixed token rows, padded-batch training
    * (seq2seq, rerankers, encoders) instead groups documents of SIMILAR
    * length so each batch pads to its own band, not the corpus max. Every
    * doc gets (band, pos_in_band, batch_id): band = n_tokens div
    * `bandWidth`; within a band docs are dealt in the reproducible q80
    * shuffle order (id-hash, then id — so batch composition is a pure
    * function of the ids, stable across reruns/engines, yet decorrelated
    * from ingest order); batch_id = pos_in_band div `batchSize`.
    *
    * Same distributed-prefix-sum shape as [[tokenOffsets]], one level
    * deeper: windows partition by (band, hash-bucket) — both bounded —
    * and the driver prefix scan runs per band over one count per (band,
    * bucket), resetting at each band boundary. The whole-band (let alone
    * whole-corpus) single-partition window never happens.
    */
  def lengthBatches(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      bandWidth: Long = 16L, batchSize: Long = 32L, buckets: Int = 64): DataFrame = {
    require(bandWidth > 0 && batchSize > 0, "positive band and batch sizes")
    val spark = docs.sparkSession
    import spark.implicits._
    val width = Sampling.HashMod / buckets + 1

    val base = docs
      .filter(col(textCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("band", expr(s"n_tokens div ${bandWidth}L"))
      .withColumn("__h", Sampling.idHash(col("id")))
      .withColumn("__b", expr(s"__h div ${width}L"))
    val w = Window.partitionBy(col("band"), col("__b")).orderBy(col("__h"), col("id"))
    val within = base.withColumn("__rn", row_number().over(w).cast("long"))

    // bounded driver scan: one count per (band, bucket); prefix resets per band
    val totals = base.groupBy(col("band"), col("__b")).agg(count(lit(1)).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val starts = {
      var prevBand = Long.MinValue
      var acc = 0L
      totals.map { case (band, b, t) =>
        if (band != prevBand) { prevBand = band; acc = 0L }
        val s = acc; acc += t
        (band, b, s)
      }.toSeq
    }
    if (starts.isEmpty) // empty input: empty output, same shape
      return docs
        .select(col(idCol).cast("long").as(idCol))
        .withColumn("n_tokens", lit(0L)).withColumn("band", lit(0L))
        .withColumn("pos_in_band", lit(0L)).withColumn("batch_id", lit(0L))
        .limit(0)
    val startDf = starts.toDF("band", "__b", "__start")

    within.join(broadcast(startDf), Seq("band", "__b"))
      .select(
        col("id").as(idCol), col("n_tokens"), col("band"),
        (col("__start") + col("__rn") - 1).as("pos_in_band"))
      .withColumn("batch_id", expr(s"pos_in_band div ${batchSize}L"))
  }

  /** q95: PADDING-WASTE report — the measurement gate that justifies
    * [[lengthBatches]] (the q77-completes-q75 pattern): a padded batch
    * costs `n_docs × max_len` tokens, so waste = 1 − Σreal/Σpadded.
    * Compares the banded assignment against the NAIVE baseline (ingest-
    * order id-blocks of `batchSize` — what a pipeline does when it
    * doesn't length-sort), one summary row per strategy. Both sides are
    * per-batch aggregations with map-side combine; the final rollup is
    * 2 rows. At sf0.1 banding cuts waste ~0.44 → ~0.06.
    */
  def paddingWaste(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      bandWidth: Long = 16L, batchSize: Long = 32L,
      buckets: Int = 64): DataFrame = {
    def rollup(strategy: String, perBatch: DataFrame): DataFrame =
      perBatch
        .agg(
          count(lit(1)).as("n_batches"),
          sum(col("n")).cast("long").as("n_docs"),
          sum(col("real")).cast("long").as("real_tokens"),
          sum(col("n") * col("mx")).cast("long").as("padded_tokens"))
        .select(
          lit(strategy).as("strategy"), col("n_batches"), col("n_docs"),
          col("real_tokens"), col("padded_tokens"),
          round(lit(1.0) - col("real_tokens").cast("double")
            / col("padded_tokens"), 6).as("waste"))

    val banded = rollup("banded",
      lengthBatches(docs, idCol, textCol, bandWidth, batchSize, buckets)
        .groupBy(col("band"), col("batch_id"))
        .agg(count(lit(1)).as("n"), max(col("n_tokens")).as("mx"),
          sum(col("n_tokens")).as("real")))
    val naive = rollup("naive",
      docs
        .filter(col(textCol).isNotNull)
        .select(
          col(idCol).cast("long").as("id"),
          size(split(col(textCol), " ")).cast("long").as("n_tokens"))
        .groupBy(expr(s"id div ${batchSize}L").as("batch_id"))
        .agg(count(lit(1)).as("n"), max(col("n_tokens")).as("mx"),
          sum(col("n_tokens")).as("real")))
    banded.unionAll(naive)
  }
}
