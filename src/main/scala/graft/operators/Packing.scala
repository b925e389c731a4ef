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
}
