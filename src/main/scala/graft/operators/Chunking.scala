package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the operator between a cleaned
  * corpus and anything that consumes bounded contexts (RAG indexing,
  * embedding models with a max sequence length, long-doc eval splits).
  * Each document yields chunks of `window` tokens starting every `stride`
  * tokens (overlap = window − stride keeps sentences that straddle a cut
  * inside at least one chunk); the final chunk truncates at the document
  * end, and a document shorter than one window is one whole chunk.
  *
  * Complements q64 sequence packing: packing concatenates docs into fixed
  * training rows (docs straddle cuts), chunking splits docs into
  * re-derivable windows keyed (doc_id, chunk_id) — provenance every RAG
  * citation needs.
  *
  * Shape: pure per-row explode — no shuffle at all, embarrassingly
  * parallel, chunk count arithmetic is integer-exact in both engines.
  * Emitted chunk text is a slice of the source doc (the operator's
  * purpose); nothing downstream re-joins the corpus.
  */
object Chunking {

  def chunks(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      window: Int = 32, stride: Int = 24): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window (stride > window would drop tokens)")
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .withColumn("len", size(col("toks")).cast("long"))
    // starts at 0, stride, 2·stride, …: one chunk when len <= window, else
    // enough that the last window reaches the end: ceil((len-window)/stride) + 1.
    // Integer `div`, not `/` (Spark `/` on longs is double division).
    val nChunks = when(col("len") <= window, lit(1L))
      .otherwise(expr(s"(len - $window + $stride - 1) div $stride") + 1)
    toks
      .select(col("doc_id"), col("toks"), col("len"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(window.toLong), col("len") - col("chunk_id") * stride).as("n_tokens"),
        array_join(slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk_text"))
  }
}
