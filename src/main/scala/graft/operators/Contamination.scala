package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-decontamination for training corpora (the GPT-3/PaLM-style
  * n-gram collision sweep): flag (test, train) document pairs whose
  * shared distinct word n-grams cover more than `minFrac` of the TEST
  * document — the check every serious LLM pipeline runs before training,
  * in both directions (drop contaminated train docs, or report tainted
  * eval examples).
  *
  * Shape: both corpora explode to (id, xxhash64(gram)) — 16 bytes/row on
  * the shuffle, grams themselves never move — then an inverted-index
  * equi-join on the gram hash (the q23 discipline, cross-corpus), count
  * per pair, divide by the test doc's gram count. Linear in corpus size ×
  * gram frequency; never all-pairs. The threshold comparison uses the
  * un-rounded ratio so both engines cut identically; the reported
  * fraction is rounded 4 dp.
  */
object Contamination {

  def pairs(
      train: DataFrame, test: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minFrac: Double = 0.8): DataFrame = {
    def grams(df: DataFrame, alias: String): DataFrame = df
      .select(col(idCol).as(alias),
        explode(TextFunctions.shingles(col(textCol), n)).as("g"))
      .select(col(alias), xxhash64(col("g")).as("gh"))
    val testSizes = test
      .select(col(idCol).as("test_id"),
        size(TextFunctions.shingles(col(textCol), n)).as("n_grams"))
      .filter(col("n_grams") > 0)
    grams(test, "test_id")
      .join(grams(train, "train_id"), Seq("gh"))
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("n_hits"))
      .join(testSizes, Seq("test_id"))
      .filter(col("n_hits").cast("double") / col("n_grams") >= minFrac)
      .select(col("test_id"), col("train_id"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_grams"), 4).as("frac"))
  }
}
