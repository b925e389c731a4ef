package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained-in-query multinomial Naive Bayes (SURVEY §2 q84) — the LEARNED
  * classifier path next to the rule paths: q30 is heuristic language ID,
  * q66 is inference with given weights; this one TRAINS on labeled rows
  * (even-id docs, `lang` as the label) inside the query and applies the
  * fitted model to the held-out odd ids — the architecture of a corpus
  * quality/domain classifier (train on weak labels, score everything).
  *
  * Training is two bounded aggregations over the labeled split: per-class
  * (token count, doc count) totals and the (class, token) count table —
  * the model is Zipf-small (classes × vocabulary ≪ corpus, and on
  * open-domain text the q67 `minCount` pruning discipline applies), so it
  * PIVOTS to one row per token with a log-likelihood column per class and
  * broadcast-joins to the scoring side; the corpus never shuffles against
  * the model. Scoring: per test doc, score_c = ln P(c) + Σ_t tf·ln
  * P(t|c) with Laplace smoothing — `ln((cnt+1)/(tokens_c+V))` covers seen
  * and unseen tokens in one formula (a missing pivot cell coalesces to
  * cnt=0). One shuffle: the per-doc score aggregation.
  *
  * Cross-engine determinism: scores round to 4 dp (the q61/q67 ln-sum
  * discipline — double-sum partition-order noise is ~1e-13, far inside
  * the rounding) and argmax breaks ties on the lexicographically smallest
  * class, so the prediction is engine- and partitioning-independent.
  */
object NaiveBayes {

  /** Fitted model state: the pivoted (token → per-class count) table plus
    * the driver-held class totals (the q86 "model is small" rule).
    */
  private case class Fitted(
      model: DataFrame, classTotals: Seq[(String, (Long, Long))],
      vocab: Long, nDocs: Long) {
    def classes: Seq[String] = classTotals.map(_._1)
  }

  /** Train on (lang, toks) rows: bounded class totals + ONE exploding
    * pass whose Zipf-small (class, token) count table serves both the
    * vocabulary size and the pivoted broadcast model (no second scan).
    */
  private def fit(train: DataFrame): Fitted = {
    val classTotals = train.groupBy(col("lang"))
      .agg(sum(size(col("toks"))).cast("long").as("tokens_c"),
        count(lit(1)).as("docs_c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val classes = classTotals.map(_._1)
    val counts = train.select(col("lang"), explode(col("toks")).as("t"))
      .groupBy(col("lang"), col("t")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val vocab = counts.select(col("t")).distinct().count()
    val model = counts
      .groupBy(col("t"))
      .pivot("lang", classes)
      .agg(first(col("c")))
      .select(col("t") +: classes.map(c => col(s"`$c`").as(s"c_$c")): _*)
    Fitted(model, classTotals, vocab, classTotals.map(_._2._2).sum)
  }

  /** Score units (any key set) holding exploded tokens `t`: per unit and
    * class, prior + Σ tf·ln smoothed likelihood, 4-dp rounded; returns
    * one row per unit with the argmax `pred` (smallest-class tiebreak).
    */
  private def predict(tokens: DataFrame, keys: Seq[String], f: Fitted): DataFrame = {
    val keyCols = keys.map(col)
    val tf = tokens
      .groupBy(keyCols :+ col("t"): _*).agg(count(lit(1)).as("tf"))
      .join(broadcast(f.model), Seq("t"), "left")
    val scoreCols = f.classTotals.map { case (c, (tokensC, docsC)) =>
      round(
        lit(math.log(docsC.toDouble / f.nDocs)) +
          sum(col("tf") *
            log((coalesce(col(s"c_$c"), lit(0L)) + lit(1.0)) /
              lit((tokensC + f.vocab).toDouble))),
        4).as(s"s_$c")
    }
    val scored = tf.groupBy(keyCols: _*).agg(scoreCols.head, scoreCols.tail: _*)
    // argmax on the ROUNDED scores; ties take the smallest class name
    // (max of (score, -classIndex) structs — engine-independent)
    val best = array_max(array(f.classes.zipWithIndex.map { case (c, i) =>
      struct(col(s"s_$c").as("s"), lit(-i).as("ni"))
    }: _*))
    scored.select(keyCols :+
      element_at(array(f.classes.map(lit): _*), -best.getField("ni") + 1).as("pred"): _*)
  }

  // NOT spread (r20, tried and rejected): fit() runs three eager actions
  // (class totals collect, counts checkpoint, vocab count) and each
  // re-executes the input subtree — a spread exchange here is re-paid per
  // action and measured +0.2-0.3 s on q84/q101; the per-row tokenize is
  // too light to amortize it.
  private def base(docs: DataFrame): DataFrame = docs
    .filter(col("text").isNotNull)
    .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
      split(col("text"), " ").as("toks"))

  def langClassifier(docs: DataFrame): DataFrame = {
    val b = base(docs)
    val f = fit(b.filter(pmod(col("doc_id"), lit(2)) === 0))
    val test = b.filter(pmod(col("doc_id"), lit(2)) === 1)
    predict(
      test.select(col("doc_id"), col("lang"), explode(col("toks")).as("t")),
      Seq("doc_id", "lang"), f)
      .select(col("doc_id"), col("lang"), col("pred"))
      .withColumn("correct", (col("lang") === col("pred")).cast("int"))
  }

  /** Chunk-level language-mixture profile — CODE-SWITCHING detection
    * (SURVEY §2 q101): the q84 model applied at q73 CHUNK grain, then
    * re-aggregated per document into the mixture statistics a
    * multilingual pipeline routes on (whole-doc language ID silently
    * mislabels mixed documents; chunk votes expose them).
    *
    * Per held-out doc over its non-overlapping `window`-token chunks:
    * chunk count, distinct predicted languages, the MAJORITY predicted
    * language, and the mixture entropy of the chunk-vote distribution
    * (`ln n − (Σ c·ln c)/n`, 4-dp, `+0.0` normalizing the −0.0 a pure
    * doc's exact zero would otherwise hash differently).
    *
    * Determinism: chunk predictions inherit q84's rounding/tiebreak; the
    * majority pick packs (votes, classIndex) into ONE long —
    * `c·16 + (15 − idx)` — so the argmax is an integer `max` (the q78
    * lesson: a struct min/max falls out of hash aggregation into
    * SortAggregate; a long max stays map-side-combinable) with ties to
    * the smallest class. Scale: everything after the chunk explode
    * aggregates by (doc, chunk) then (doc) — map-side combinable; the
    * model broadcasts as in q84; ≤ 16 classes by construction.
    */
  def chunkMixture(docs: DataFrame, window: Int = 16): DataFrame = {
    val b = base(docs)
    val f = fit(b.filter(pmod(col("doc_id"), lit(2)) === 0))
    require(f.classes.size <= 16, "majority packing supports ≤ 16 classes")

    val test = b.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("toks"))
    val chunkTokens = Chunking.chunks(
      test.select(col("doc_id"), array_join(col("toks"), " ").as("text")),
      "doc_id", "text", window = window, stride = window)
      .select(col("doc_id"), col("chunk_id"),
        explode(split(col("chunk_text"), " ")).as("t"))

    val chunkPred = predict(chunkTokens, Seq("doc_id", "chunk_id"), f)

    val votes = chunkPred.groupBy(col("doc_id"), col("pred"))
      .agg(count(lit(1)).as("c"))
      .withColumn("idx",
        array_position(array(f.classes.map(lit): _*), col("pred")) - 1)

    votes.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_chunks"),
        count(lit(1)).as("n_langs"),
        max(col("c") * 16 + (lit(15) - col("idx"))).as("__mk"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("__clnc"))
      .select(
        col("doc_id"), col("n_chunks"), col("n_langs"),
        element_at(array(f.classes.map(lit): _*),
          (lit(16) - pmod(col("__mk"), lit(16))).cast("int")).as("major_pred"),
        (round(log(col("n_chunks").cast("double")) -
          col("__clnc") / col("n_chunks"), 4) + 0.0).as("mix_entropy"),
        (col("n_langs") > 1).cast("int").as("is_mixed"))
  }
}
