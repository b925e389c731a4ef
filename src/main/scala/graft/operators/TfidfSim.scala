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
  * Reproducibility discipline: BOTH order-sensitive double sums (the
  * per-doc norm and the per-pair dot product) accumulate as DECIMAL, so
  * the cosine is independent of partition order and identical on any
  * engine — the threshold can then cut on the exact value. Cost is the
  * q23 inverted-index story: ∝ Σ df² over terms, inherent to exact
  * pairing; MinHash (q21) is the approximation when that bites.
  */
object TfidfSim {

  def cosinePairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(countDistinct(col(idCol)).cast("double").as("n_docs"))

    val w = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc"), col("term"),
        (col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1)).as("w"))
    val norms = w.groupBy(col("doc"))
      .agg(sqrt(sum((col("w") * col("w")).cast("decimal(30,12)")).cast("double"))
        .as("norm"))
    val wn = w.join(norms, Seq("doc"))
      .select(col("doc"), col("term"), (col("w") / col("norm")).as("wn"))

    val a = wn.toDF("doc_a", "term", "wn_a")
    val b = wn.toDF("doc_b", "term", "wn_b")
    a.join(b, Seq("term"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(sum((col("wn_a") * col("wn_b")).cast("decimal(30,12)"))
        .cast("double"), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("cosine"))
  }
}
