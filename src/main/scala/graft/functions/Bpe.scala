package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (GPT-2's merge discipline): an ordered
  * merge list is the whole model — apply = repeatedly fuse the adjacent
  * symbol pair with the LOWEST merge rank until none applies.
  *
  * The q32 token counter estimates tokens with a regex; this is the real
  * thing a training pipeline budgets with. The greedy fixpoint has no
  * relational FIXPOINT form, but the registered queries train a fixed
  * k = 50 rounds, so since r10 the DuckDB twin unrolls the trainer
  * round-by-round (the q114/q103 bounded-iteration precedent) and q76/q92
  * carry full value oracles; ScalaTest additionally pins the semantics:
  * the classic low/lower/newest corpus learns the textbook merges, tokens
  * re-concatenate to their word, and the vocab-join path equals direct
  * per-occurrence segmentation.
  *
  * Scale shape (the part that must be Spark-first):
  *   - TRAINING inputs a (word, count) table — built by one distributed
  *     aggregation — and loops over the VOCABULARY on the driver
  *     (Zipf: vocab ≪ corpus; for open-domain 100 TB text, prune the
  *     table first with q67's minCount discipline or train on a q35
  *     sample — the contract is the table fits the driver, not the corpus).
  *   - APPLICATION segments each DISTINCT word once (a vocab-sized job)
  *     and joins the (word → n_tokens) dictionary back to occurrences:
  *     work ∝ vocab + corpus rows, never corpus × word-length re-merging.
  *     The dictionary is Zipf-small → broadcast; the occurrence side
  *     shuffles nothing but (id, word-hash) counts.
  */
object Bpe {

  /** The FIXED demo merge list q76b applies (common-English letter pairs,
    * two-level: "t"+"h" then "th"+"e"). A LITERAL, not a trained artifact,
    * by design: the APPLY step of BPE is deterministic given a merge list,
    * so pinning the list gives the apply path a true cross-engine oracle
    * (the DuckDB twin replays these exact ordered merges in a recursive
    * CTE) — which the TRAIN step's greedy fixpoint (q76) cannot have.
    * Shared between the registered query and [[graft.OracleSql]] so the
    * two sides cannot drift.
    */
  val DemoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("r", "e"), ("o", "n"),
    ("e", "r"), ("an", "d"), ("o", "r"), ("e", "n"), ("a", "t"), ("e", "s"),
    ("o", "u"), ("i", "s"), ("t", "o"), ("s", "t"))

  /** Greedy BPE segmentation of one word under rank-ordered merges.
    * GPT-2 order: at each step ALL occurrences of the single lowest-rank
    * adjacent pair fuse left-to-right, then ranks are re-examined.
    */
  def segmentWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = word.map(_.toString).toVector
    while (syms.size >= 2) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) return syms
      val (a, b) = (syms(best), syms(best + 1))
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.size) {
        if (j < syms.size - 1 && syms(j) == a && syms(j + 1) == b) {
          out += (a + b); j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** Learn `k` merges from a (word, count) table — the standard BPE
    * trainer: per round, fuse the pair with the highest corpus-weighted
    * frequency (lexicographic tie-break so training is deterministic on
    * any input order).
    */
  def trainMerges(wordCounts: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    var words = wordCounts.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val freq = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.size - 1)
        freq.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (freq.isEmpty) done = true
      else {
        val best = freq.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val (a, b) = best
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.size) {
            if (j < syms.size - 1 && syms(j) == a && syms(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }
        round += 1
      }
    }
    merges.result()
  }

  /** Distributed word-count aggregation feeding [[trainMerges]]. The
    * collect is the vocabulary, not the corpus; `maxVocab` keeps the
    * driver honest (top-N by count, deterministic word tie-break — the
    * tail it drops is exactly the tail BPE would never merge first).
    */
  def trainFromCorpus(docs: DataFrame, textCol: String, k: Int,
      maxVocab: Int = 100000): Seq[(String, String)] = {
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainMerges(counts, k)
  }

  /** q76: per-doc real-tokenizer budget — whitespace tokens vs BPE tokens.
    * Segments each DISTINCT word once, broadcasts the (word, n_bpe)
    * dictionary, joins occurrences back. Returns
    * (doc_id, n_tokens, n_bpe_tokens, roundtrip_ok, join_ok, fertility_ok).
    *
    * The three `_ok` columns are IN-QUERY SELF-GATES (the q17/q44/q46 gate
    * discipline): BPE's greedy fixpoint has no SQL form, so the driver's
    * oracle can only count rows — these booleans carry the invariants the
    * value check can't, and BpeSpec asserts them all-true:
    *   - `roundtrip_ok`: every word's BPE segments concatenate back to the
    *     word (lossless segmentation),
    *   - `join_ok`: the dictionary-join occurrence count equals a direct
    *     scan-side word count (the broadcast join lost/duplicated nothing),
    *   - `fertility_ok`: n_bpe_tokens ≥ n_tokens (a word is ≥ 1 token).
    */
  def tokenCounts(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val occ = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w")).filter(col("w") =!= "")
    val dict = occ.select("w").distinct().as[String]
      .mapPartitions { it =>
        val r = bc.value
        it.map { w =>
          val segs = segmentWord(w, r)
          (w, segs.size.toLong, segs.mkString == w)
        }
      }.toDF("w", "n_bpe", "rt_ok")
    val direct = docs.select(col(idCol).as("doc_id"),
      size(filter(split(col(textCol), " "), w => w =!= lit("")))
        .cast("long").as("n_words_direct"))
    occ.join(broadcast(dict), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_bpe")).as("n_bpe_tokens"),
        bool_and(col("rt_ok")).as("roundtrip_ok"))
      .join(direct, Seq("doc_id"))
      .withColumn("join_ok", col("n_tokens") === col("n_words_direct"))
      .withColumn("fertility_ok", col("n_bpe_tokens") >= col("n_tokens"))
      .drop("n_words_direct")
  }

  /** q92: tokenizer FERTILITY report per corpus slice — BPE tokens per
    * whitespace word, the standard metric for how well a tokenizer fits a
    * corpus slice (multilingual tokenizer papers report exactly this;
    * fertility ≫ 1 on a source means its text fragments into char-level
    * pieces and trains poorly). Pure rollup of [[tokenCounts]] joined back
    * to the slice column — the BPE work is the q76 machinery unchanged,
    * so cost is one dictionary segmentation + two bounded aggregations.
    * Returns (slice, n_docs, n_words, n_bpe_tokens, fertility 4 dp,
    * roundtrip_ok, fertility_ok) — the `_ok` pair rolls up q76's per-doc
    * self-gates (all-true in BpeSpec; `fertility_ok` additionally pins the
    * slice-level fertility ≥ 1 invariant the rows-only oracle can't check).
    */
  def fertility(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, sliceCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    tokenCounts(spark, docs, idCol, textCol, merges)
      .join(docs.select(col(idCol).as("doc_id"),
        coalesce(col(sliceCol), lit("(null)")).as("slice")), Seq("doc_id"))
      .groupBy(col("slice"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_words"),
        sum(col("n_bpe_tokens")).cast("long").as("n_bpe_tokens"),
        round(sum(col("n_bpe_tokens")).cast("double")
          / sum(col("n_tokens")), 4).as("fertility"),
        bool_and(col("roundtrip_ok") && col("join_ok")).as("roundtrip_ok"),
        bool_and(col("fertility_ok")).as("fertility_ok"))
      .withColumn("fertility_ok", col("fertility_ok") && col("fertility") >= 1.0)
  }
}
