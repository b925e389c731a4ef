package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse TF-IDF cosine document similarity — the lexical-overlap near-dup
  * detector that sits between exact n-gram Jaccard (q23: set overlap,
  * order-insensitive) and embedding cosine (q24/q24b: semantic, needs a
  * model): rare shared terms count for more, boilerplate counts for less.
  *
  * Pipeline (all linear aggregations + one inverted-index join):
  * (doc, term, tf) → df per term → smoothed idf = ln((N+1)/(df+1))+1 (the
  * q42 formula) → L2-normalize per doc → term-at-a-time pair join
  * (`a.doc < b.doc`) → cosine = Σ wn_a·wn_b per pair ≥ τ.
  *
  * Reproducibility discipline: the per-doc norm accumulates as DECIMAL
  * (one row per (doc, term) — off the hot path), and the normalized
  * weights are then QUANTIZED to 6-dp integers so the per-pair dot
  * product — the hot loop — is an exact LONG sum: order-independent,
  * engine-identical, and integer-speed instead of decimal-speed
  * (measured 3× on the pair join). The reported cosine is the quantized
  * one (error ≤ ~1e-6·√dims), and the threshold cuts on exactly that
  * value in both engines.
  *
  * Scale: the inverted index costs Σ df² over terms — fine on natural
  * vocabularies (Zipf: most terms are rare), DEGENERATE when every term
  * is common (measured here: the 31-word synthetic vocabulary makes every
  * pair collide on every term — 343 s at sf0.1 unblocked). `blockCol` is
  * the standard answer: pair only within a blocking key (source, domain,
  * language, an LSH bucket), which divides df² by the block count
  * squared. Unblocked remains available for natural-vocab corpora; q21
  * MinHash is the sub-quadratic approximation when neither fits.
  */
object TfidfSim {

  def cosinePairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, blockCol: Option[String] = None): DataFrame = {
    val blk = blockCol.map(c => col(c).as("blk")).toSeq
    val tf = docs
      .select(Seq(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("term")) ++ blk: _*)
      .groupBy(col("doc") +: col("term") +: blk.map(_ => col("blk")): _*)
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(countDistinct(col(idCol)).cast("double").as("n_docs"))

    val keep = Seq(col("doc"), col("term")) ++ blk.map(_ => col("blk"))
    val w = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .select(keep :+
        (col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1)).as("w"): _*)
    val norms = w.groupBy(col("doc"))
      .agg(sqrt(sum((col("w") * col("w")).cast("decimal(30,12)")).cast("double"))
        .as("norm"))
    val wn = w.join(norms, Seq("doc"))
      .select(keep :+
        round(col("w") / col("norm") * lit(1e6)).cast("long").as("wn"): _*)

    val joinKeys = "term" +: blk.map(_ => "blk")
    val a = wn.columns.foldLeft(wn)((d, c) =>
      if (c == "doc" || c == "wn") d.withColumnRenamed(c, c + "_a") else d)
    val b = wn.columns.foldLeft(wn)((d, c) =>
      if (c == "doc" || c == "wn") d.withColumnRenamed(c, c + "_b") else d)
    a.join(b, joinKeys)
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(sum(col("wn_a") * col("wn_b")).cast("double") / lit(1e12), 4)
        .as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("cosine"))
  }
}
