package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the ingest-time twin of
  * [[graft.operators.Dedup.exact]] for a training-data pipeline that
  * consumes a document firehose.
  *
  * `dropDuplicates` on the 64-bit normalized-text digest, bounded by a
  * watermark: Spark keeps one state row per digest seen within the
  * watermark horizon, so memory is O(docs per horizon), not O(stream).
  * Duplicates arriving later than the horizon pass through — the standard
  * streaming-dedup compromise; an offline [[Dedup.exact]] pass over the
  * sink stays the source of truth for exactness.
  */
object StreamDedup {

  /** docs(ts, idCol, textCol, ...) → first-seen rows per digest within the
    * watermark horizon. Emits the full row (the surviving corpus), plus
    * the digest for downstream bookkeeping.
    */
  def firstSeen(docs: DataFrame, textCol: String, watermarkDelay: String = "1 hour"): DataFrame = {
    val digested = docs.withColumn("digest", xxhash64(Dedup.normalized(col(textCol))))
    if (docs.isStreaming)
      // dropDuplicatesWithinWatermark (not plain dropDuplicates): the
      // watermark actually EVICTS digest state; plain dropDuplicates on a
      // non-event-time key would keep state forever.
      digested
        .withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("digest")
    else digested.dropDuplicates("digest")
  }
}
