package graft.operators

import org.apache.spark.sql.DataFrame
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

  def langClassifier(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        split(col("text"), " ").as("toks"))
    val train = base.filter(pmod(col("doc_id"), lit(2)) === 0)
    val test = base.filter(pmod(col("doc_id"), lit(2)) === 1)

    // class totals + vocabulary size: bounded aggregations on the driver
    val classTotals = train.groupBy(col("lang"))
      .agg(sum(size(col("toks"))).cast("long").as("tokens_c"),
        count(lit(1)).as("docs_c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val classes = classTotals.map(_._1)
    val nDocs = classTotals.map(_._2._2).sum

    // ONE exploding pass over the train split: the Zipf-small (class,
    // token) count table is materialized and serves both the vocabulary
    // size and the pivoted model (no second corpus scan)
    val counts = train.select(col("lang"), explode(col("toks")).as("t"))
      .groupBy(col("lang"), col("t")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val vocab = counts.select(col("t")).distinct().count()

    // (token -> per-class count) pivoted model, broadcast
    val model = counts
      .groupBy(col("t"))
      .pivot("lang", classes)
      .agg(first(col("c")))
      .select(col("t") +: classes.map(c => col(s"`$c`").as(s"c_$c")): _*)

    // per test doc and class: prior + sum of tf * smoothed log-likelihood
    val tf = test
      .select(col("doc_id"), col("lang"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("lang"), col("t")).agg(count(lit(1)).as("tf"))
      .join(broadcast(model), Seq("t"), "left")
    val scoreCols = classTotals.map { case (c, (tokensC, docsC)) =>
      round(
        lit(math.log(docsC.toDouble / nDocs)) +
          sum(col("tf") *
            log((coalesce(col(s"c_$c"), lit(0L)) + lit(1.0)) / lit((tokensC + vocab).toDouble))),
        4).as(s"s_$c")
    }
    val scored = tf.groupBy(col("doc_id"), col("lang"))
      .agg(scoreCols.head, scoreCols.tail: _*)

    // argmax on the ROUNDED scores; ties take the smallest class name
    // (max of (score, -classIndex) structs — engine-independent)
    val best = array_max(array(classes.zipWithIndex.map { case (c, i) =>
      struct(col(s"s_$c").as("s"), lit(-i).as("ni"))
    }: _*))
    scored
      .select(col("doc_id"), col("lang"),
        element_at(array(classes.map(lit): _*), -best.getField("ni") + 1).as("pred"))
      .withColumn("correct", (col("lang") === col("pred")).cast("int"))
  }
}
