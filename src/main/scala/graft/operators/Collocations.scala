package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** PMI collocation mining (SURVEY §2 q89) — top-k adjacent-bigram
  * collocations per language by pointwise mutual information, the corpus
  * statistic behind multi-word-expression vocabularies (tokenizer merge
  * seeding, stopword-phrase lists, domain terminology drift): PMI(x,y) =
  * ln(p(x,y) / (p(x)p(y))) with p(x,y) = c(xy)/Σbigrams and p(x) =
  * c(x)/Σtokens, both per language. A high-PMI pair co-occurs far more
  * than its parts' frequencies predict.
  *
  * Shape: the tokenized corpus is materialized ONCE and feeds the three
  * derivations (unigram counts, bigram counts, per-lang totals); bigrams
  * come from a per-row `zip_with` over the token array (no positional
  * self-join); the only corpus-sized shuffles are the two count
  * aggregations, both map-side-combined on (lang, gram) keys — Zipf
  * vocabularies make the reduced side vocabulary-sized, and `minCount`
  * prunes the bigram tail BEFORE the joins (a Zipf corpus's hapax bigrams
  * dominate the distinct count, and none of them can be reported). The
  * per-lang totals broadcast; ranking reduces through [[BoundedTopK]]
  * (≤ k rows leave each partition per language — no window sort).
  *
  * Cross-engine: PMI is ONE ln of ONE quotient, numerator and denominator
  * each multiplied in fixed order as doubles
  * (((c_xy·n)·n) / ((nb·c_x)·c_y)), rounded 4 dp (the q67 ln discipline)
  * before ranking with a bigram-string tiebreak.
  *
  * Returns (lang, rank, bigram, pmi).
  */
object Collocations {

  def pmiTopK(docs: DataFrame, k: Int = 20, minCount: Int = 5): DataFrame = {
    val t = docs
      .filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("lang"), split(col("text"), " ").as("toks"))
      .localCheckpoint()

    val stats = t.groupBy(col("lang")).agg(
      sum(size(col("toks"))).cast("long").as("n"),
      sum(greatest(size(col("toks")) - 1, lit(0))).cast("long").as("nb"))

    val unigrams = t
      .select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))

    val bigrams = t
      .select(col("lang"), explode(
        when(size(col("toks")) >= 2,
          zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array())).as("bg"))
      .groupBy(col("lang"), col("bg"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)

    val scored = bigrams
      .withColumn("x", element_at(split(col("bg"), " "), 1))
      .withColumn("y", element_at(split(col("bg"), " "), 2))
      .join(unigrams.select(col("lang"), col("tok").as("x"), col("c").as("cx")),
        Seq("lang", "x"))
      .join(unigrams.select(col("lang"), col("tok").as("y"), col("c").as("cy")),
        Seq("lang", "y"))
      .join(broadcast(stats), Seq("lang"))
      .select(col("lang"), col("bg"),
        round(log(
          col("cxy").cast("double") * col("n") * col("n")
            / (col("nb").cast("double") * col("cx") * col("cy"))), 4).as("pmi"))

    val topk = udaf(
      new BoundedTopK[(Double, String)](k)((a, x) =>
        a._1 > x._1 || (a._1 == x._1 && a._2 < x._2)),
      Encoders.product[(Double, String)])
    scored
      .groupBy(col("lang"))
      .agg(topk(col("pmi"), col("bg")).as("w"))
      .select(col("lang"), posexplode(col("w")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("t._2").as("bigram"), col("t._1").as("pmi"))
  }
}
