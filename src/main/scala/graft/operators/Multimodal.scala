package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** A multimodal record: opaque media payload + typed metadata. At 100 TB
  * the payload column stays `binary` end to end — it is never parsed by
  * Catalyst, only by the batched decode step — and partitioning/pruning
  * happen on the scalar metadata columns.
  */
case class MediaRecord(doc_id: Long, fmt: String, payload: Array[Byte])

/** Decoded media metadata (the output of the decode/feature-extract step). */
case class MediaMeta(doc_id: Long, fmt: String, n_bytes: Long, width: Int, height: Int)

/** Multimodal column handling (SURVEY §2 q40).
  *
  * The image/audio decode libraries are not in this container, so
  * [[decodeStub]] is a clearly-marked DETERMINISTIC FAKE of the decode
  * step; everything around it — the binary-payload schema, the typed
  * `Dataset` boundary, the batched `mapPartitions` shape (decoders want
  * batches, not single frames), and the arithmetic on byte counts — is the
  * real Spark plumbing a production decode would slot into.
  */
object Multimodal {

  /** How many records each decode call receives. Real decoders amortize
    * model/library setup per batch; the stub keeps the same call shape.
    */
  val DecodeBatchSize = 64

  /** STUB (deterministic fake): stands in for an image decode. Derives
    * "dimensions" from the payload length so the oracle can reproduce it
    * with plain SQL arithmetic. A real implementation would decode
    * `r.payload` with an imaging library here — batch-shaped exactly like
    * this.
    */
  def decodeStub(batch: Seq[MediaRecord]): Seq[MediaMeta] =
    batch.map { r =>
      val n = r.payload.length.toLong
      MediaMeta(r.doc_id, r.fmt, n, (n % 640L).toInt, ((n * 31L) % 480L).toInt)
    }

  /** Wrap a text corpus as media records: payload = utf-8 bytes, format
    * assigned deterministically. In production the payload would come from
    * a binary-file source (`spark.read.format("binaryFile")` or parquet
    * with a binary column); the downstream plumbing is identical.
    */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** q40: batched metadata extraction over the opaque payload column.
    * `mapPartitions` + `grouped(DecodeBatchSize)` gives each decode call a
    * batch while streaming the partition (no full-partition materialize).
    */
  def extractMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decodeStub(batch))
    }
  }

  /** End-to-end q40 entry: documents → media records → batched decode →
    * typed metadata DataFrame.
    */
  def metaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    extractMeta(asMedia(docs)).toDF()
}
