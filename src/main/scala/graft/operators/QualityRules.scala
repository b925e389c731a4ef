package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style quality RULE GATE (SURVEY §2 q91; Rae et al. 2021 Gopher
  * §A1.1, the filter recipe FineWeb/RefinedWeb inherit): where q31 emits
  * raw quality SIGNALS, this emits the DECISION table — one boolean per
  * rule plus the conjunction — so a pipeline can both filter
  * (`WHERE passes`) and audit WHICH rule kills which slice of the corpus
  * (the per-rule drop rates are the tuning dashboard).
  *
  * Rules (thresholds parameterized, defaults sized to the corpus):
  *   r_word_count   minWords ≤ n_words ≤ maxWords
  *   r_mean_len     3 ≤ mean word length ≤ 10
  *   r_alpha        ≥ 80% of words contain an alphabetic character
  *   r_stopwords    ≥ 2 stopword occurrences (Gopher's "has common
  *                  English words" proxy)
  *   r_symbols      ≤ 10% of words are symbol junk (#, …)
  *
  * Scale shape: every signal is a per-row HOF fold over the token array —
  * NO explode, NO shuffle, NO join; the gate runs at scan speed and
  * composes with any downstream operator. (Repetition rules — top-gram
  * share etc. — live in q38, which needs a (doc, gram) aggregation; keep
  * the scan-speed and shuffle-bearing rule sets separate so the cheap
  * gate can run first and shrink the expensive one's input.)
  *
  * Cross-engine: ratios are integer-count divisions rounded 4 dp; for
  * n ≤ 10⁴ words a mathematical 4-dp tie only occurs with a power-of-two
  * denominator, which is binary-exact, so double rounding agrees between
  * engines (the hazard DSIR's decimal sums DO hit never arises here).
  */
object QualityRules {

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "on")

  def gopherRules(
      docs: DataFrame, minWords: Int = 20, maxWords: Int = 80): DataFrame = {
    val toks = split(col("text"), " ")
    def nMatching(p: Column => Column): Column =
      size(filter(toks, p)).cast("long")
    val nWords = size(toks).cast("long")
    val meanLen = round(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / nWords, 4)
    val alphaRatio = round(
      nMatching(_.rlike("[A-Za-z]")).cast("double") / nWords, 4)
    val nStop = nMatching(_.isInCollection(Stopwords))
    val symbolRatio = round(
      nMatching(t => t.contains("#") || t.contains("...")).cast("double")
        / nWords, 4)

    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        nWords.as("n_words"), meanLen.as("mean_word_len"),
        alphaRatio.as("alpha_ratio"), nStop.as("n_stopwords"),
        symbolRatio.as("symbol_ratio"))
      .withColumn("r_word_count",
        col("n_words").between(minWords, maxWords))
      .withColumn("r_mean_len", col("mean_word_len").between(3.0, 10.0))
      .withColumn("r_alpha", col("alpha_ratio") >= 0.8)
      .withColumn("r_stopwords", col("n_stopwords") >= 2)
      .withColumn("r_symbols", col("symbol_ratio") <= 0.1)
      .withColumn("passes",
        col("r_word_count") && col("r_mean_len") && col("r_alpha")
          && col("r_stopwords") && col("r_symbols"))
  }
}
