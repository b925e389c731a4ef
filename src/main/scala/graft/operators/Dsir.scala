package graft.operators

import graft.plans.HashFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR importance weights (SURVEY §2 q90; Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") — score every
  * document by how target-domain-like it is, using two hashed
  * bag-of-ngrams unigram+bigram distributions estimated IN the query:
  * p̂ from the target slice (here: the `targetLang` documents), q̂ from
  * the whole corpus. log w(doc) = Σ_features [ln p̂(b) − ln q̂(b)] with
  * add-one smoothing over the `buckets` hashed feature space. Resampling
  * the corpus ∝ w is the DSIR selection step; emitting the weight keeps
  * the operator composable (feed q54's weighted sampler, or threshold).
  *
  * Scale shape: the featurizer is the single-pass native
  * [[graft.plans.NgramBuckets]] kernel (no per-ngram HOF chains); the
  * MODEL is tiny by construction — `buckets` rows no matter the corpus
  * (DSIR's point: a 10⁴-bucket hashed distribution suffices at web
  * scale) — so both count aggregations reduce to `buckets` rows with
  * map-side combine, the per-bucket log-ratio table BROADCASTS, and the
  * corpus is never shuffled against the model. Per-doc scoring shuffles
  * (doc, bucket, count) — bounded by min(doc features, buckets) rows per
  * doc.
  *
  * Cross-engine: the log-ratio is rounded 6 dp per BUCKET, the per-doc
  * sum is Σ count·ratio accumulated as DECIMAL (order-independent), and
  * the final weight rounds 4 dp (the q67 ln-sum discipline). Returns
  * (doc_id, n_feats, log_weight).
  */
object Dsir {

  def importanceWeights(
      docs: DataFrame, targetLang: String = "en",
      buckets: Int = 64): DataFrame = {
    val spark = docs.sparkSession

    val ex = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(HashFunctions.ngramBuckets(col("text"), 1, 2, buckets)).as("b"))

    // per-doc per-bucket counts feed BOTH the global distributions and the
    // scoring join — one corpus pass, one (doc, bucket) shuffle
    val dc = ex
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()

    val spine = spark.range(buckets).select(col("id").cast("int").as("b"))
    val tc = dc.filter(col("lang") === targetLang)
      .groupBy(col("b")).agg(sum(col("cnt")).as("tc"))
    val rc = dc.groupBy(col("b")).agg(sum(col("cnt")).as("rc"))
    val totals = dc.agg(
      sum(when(col("lang") === targetLang, col("cnt")).otherwise(lit(0)))
        .cast("long").as("tt"),
      sum(col("cnt")).cast("long").as("rt"))

    val ratio = spine
      .join(tc, Seq("b"), "left").join(rc, Seq("b"), "left")
      .join(totals)
      .select(col("b"),
        round(
          log((coalesce(col("tc"), lit(0L)) + 1).cast("double")
            / (col("tt") + lit(buckets)))
            - log((coalesce(col("rc"), lit(0L)) + 1).cast("double")
              / (col("rt") + lit(buckets))), 6).as("lr"))

    dc.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).cast("long").as("n_feats"),
        // round the DECIMAL (exact HALF_UP — 6-dp sums hit true 4-dp
        // ties), THEN cast: rounding the double instead diverges between
        // engines on ties like -0.29255
        round(sum(col("lr").cast("decimal(12,6)") * col("cnt")), 4)
          .cast("double").as("log_weight"))
  }
}
