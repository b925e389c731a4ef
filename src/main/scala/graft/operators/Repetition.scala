package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", table A1): the fraction of a document
  * occupied by repeated tokens / the single most common token / the single
  * most common bigram. Training-data pipelines threshold these to drop
  * machine-generated and boilerplate pages before training.
  *
  * Shape: explode → (doc, term) count → per-doc max/sum. Both shuffles
  * carry (doc_id, term-hash-sized) rows with map-side partial aggregation;
  * nothing holds a whole document's term distribution in one buffer, so a
  * pathological 1 GB document costs bandwidth, not executor memory — the
  * property an `aggregate()`-HOF-over-tokens formulation would lose.
  */
object Repetition {

  /** Per-document repetition profile over `idCol`/`textCol`:
    * n_tokens, dup_word_frac (1 − distinct/total), top_word_frac,
    * top_bigram_frac. Fractions rounded to 6 dp for engine-stable hashes.
    */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))

    val words = base
      .select(col(idCol), explode(col("toks")).as("t"))
      .groupBy(col(idCol), col("t"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"))

    // bigrams with duplicates kept (unlike shingles(): repetition is the
    // signal here, so the distinct-set kernel would erase it)
    val n = size(col("toks"))
    val bigrams = zip_with(
      slice(col("toks"), lit(1), n - 1),
      slice(col("toks"), lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    val bg = base
      .select(col(idCol), explode(bigrams).as("g"))
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bg_cnt"))

    // left join: a 1-token doc has no bigrams — its bigram fraction is 0
    words
      .join(bg, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("dup_word_frac"),
        round(col("top_cnt").cast("double") / col("n_tokens"), 6).as("top_word_frac"),
        round(
          coalesce(col("top_bg_cnt").cast("double") / col("n_bigrams"), lit(0.0)), 6)
          .as("top_bigram_frac"))
  }
}
