package graft.operators

import graft.functions.TextFunctions
import graft.plans.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse TF-IDF cosine document similarity — the lexical-overlap near-dup
  * detector that sits between exact n-gram Jaccard (q23: set overlap,
  * order-insensitive) and embedding cosine (q24/q24b: semantic, needs a
  * model): rare shared terms count for more, boilerplate counts for less.
  *
  * Pipeline (linear aggregations + a PREFIX-FILTERED candidate join +
  * array-local verification):
  * (doc, term, tf) → df per term → smoothed idf = ln((N+1)/(df+1))+1 (the
  * q42 formula) → L2-normalize per doc → candidate pairs from a prefix
  * inverted index → exact cosine per candidate via a codegen'd
  * sorted-merge dot over the two docs' term arrays → pairs ≥ τ.
  *
  * Candidate generation is LOSSLESS prefix filtering (Bayardo et al.,
  * "Scaling Up All Pairs Similarity Search", WWW'07): order terms
  * globally by (df asc, term) and index, per doc, only the head of that
  * order whose REMAINING suffix has L2 norm < τ. If two docs share no
  * indexed term of either doc, every shared term sits in one doc's
  * suffix, so cos ≤ ‖suffix‖·‖other‖ < τ — the pair can't be a result.
  * Rarity order makes prefixes land on low-df terms, so the inverted
  * index cost collapses from Σ df² to Σ prefix-df² (boilerplate terms
  * fall out of almost every prefix). The bound is applied with a 1e-3
  * slack below τ, far above the quantization (≤ ~1e-6·√dims) and 4-dp
  * rounding (5e-5) error of the final score, so the filter never drops
  * a reported pair.
  *
  * Hot-term guard: a term whose (block-local) prefix posting list still
  * holds f docs would put all f²/2 candidate pairs in ONE join task. Lists
  * longer than `maxPostings` are split into ⌈f/maxPostings⌉ hash chunks
  * and joined chunk-triangle-wise (side A explodes to (g, hi≥g), side B
  * to (lo≤g, g)), so each task handles ≤ maxPostings² candidates regardless
  * of skew — the degenerate single-block corpus stops being a single-task
  * quadratic (spec: DedupSpec "degenerate hot block").
  *
  * Verification never re-shuffles the term table: each doc's (terms, wns)
  * ride as sorted arrays, candidates hash-join the two vectors by id, and
  * [[graft.plans.VectorKernels.sparseDotLong]] walks the arrays once
  * inside whole-stage codegen.
  *
  * Reproducibility discipline: the per-doc norm accumulates as DECIMAL
  * (one row per (doc, term) — off the hot path), and the normalized
  * weights are then QUANTIZED to 6-dp integers so the per-pair dot
  * product — the hot loop — is an exact LONG sum: order-independent,
  * engine-identical, and integer-speed. The reported cosine is the
  * quantized one (error ≤ ~1e-6·√dims), and the threshold cuts on exactly
  * that value in both engines.
  *
  * `blockCol` (source, domain, language, an LSH bucket) additionally
  * restricts pairs to a declared blocking key — a SEMANTIC restriction
  * the caller opts into, not a performance crutch: with the prefix filter
  * and the hot-term guard, the unblocked path is also bounded.
  */
object TfidfSim {

  def cosinePairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, blockCol: Option[String] = None,
      maxPostings: Int = 1024): DataFrame = {
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
      .select(keep ++ Seq(col("df"),
        (col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1)).as("w")): _*)
    val norms = w.groupBy(col("doc"))
      .agg(sqrt(sum((col("w") * col("w")).cast("decimal(30,12)")).cast("double"))
        .as("norm"))
    // The weight table feeds FOUR consumers (vectors, prefix, and both
    // candidate-join sides); without materialization every branch
    // recomputes the whole tf→df→norm chain from the scan — measured 36
    // source scans per run at sf0.01. localCheckpoint pins it to executor
    // disk once (the q47/q34 shared-subplan discipline): at 100 TB this is
    // the difference between one corpus pass and dozens.
    val wn = w.join(norms, Seq("doc"))
      .select(keep ++ Seq(col("df"),
        (col("w") / col("norm")).as("dn"),
        round(col("w") / col("norm") * lit(1e6)).cast("long").as("wn")): _*)
      .localCheckpoint()

    // Per-doc sorted sparse vector: the verification payload. One shuffle
    // keyed by doc; sort_array gives the binary-UTF8 order sparseDotLong
    // merges on.
    val vecs = wn.groupBy(col("doc"))
      .agg(sort_array(collect_list(struct(col("term"), col("wn")))).as("tw"))
      .select(col("doc"),
        transform(col("tw"), x => x.getField("term")).as("terms"),
        transform(col("tw"), x => x.getField("wn")).as("wns"))

    // Prefix index: walking the global order from the HOT end (df desc),
    // the running Σ dn² at a term equals the suffix mass from that term
    // to the end — keep exactly the terms where it still reaches τ².
    val slack = math.max(threshold - 1e-3, 0.0)
    val revWin = Window.partitionBy(col("doc"))
      .orderBy(col("df").desc, col("term").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = wn
      .withColumn("revcum", sum(col("dn") * col("dn")).over(revWin))
      .filter(col("revcum") >= lit(slack * slack))
      .select(keep: _*)

    // Chunk-triangle candidate join: pair (x, y) with chunks (gx, gy)
    // meets exactly once on key (term[, blk], min(gx,gy), max(gx,gy)).
    val pKey = "term" +: blk.map(_ => "blk")
    val pdf = prefix.groupBy(pKey.map(col): _*).agg(count(lit(1)).as("pdf"))
    // both triangle-join sides explode from pc: materialize it once
    val pc = prefix.join(pdf, pKey)
      .withColumn("chunks", ceil(col("pdf") / lit(maxPostings)).cast("int"))
      .withColumn("g", pmod(xxhash64(col("doc")), col("chunks")).cast("int"))
      .localCheckpoint()
    val aSide = pc.select(pKey.map(col) ++ Seq(col("doc").as("doc_1"),
      col("g").as("lo"), explode(sequence(col("g"), col("chunks") - 1)).as("hi")): _*)
    val bSide = pc.select(pKey.map(col) ++ Seq(col("doc").as("doc_2"),
      explode(sequence(lit(0), col("g"))).as("lo"), col("g").as("hi")): _*)
    val cand = aSide.join(bSide, pKey :+ "lo" :+ "hi")
      // lo < hi pairs meet once with arbitrary side order; lo == hi pairs
      // meet in both orders — keep one and drop self-pairs
      .filter(col("lo") < col("hi") || col("doc_1") < col("doc_2"))
      .select(least(col("doc_1"), col("doc_2")).as("id_a"),
        greatest(col("doc_1"), col("doc_2")).as("id_b"))
      .distinct()

    val va = vecs.select(col("doc").as("id_a"),
      col("terms").as("terms_a"), col("wns").as("wns_a"))
    val vb = vecs.select(col("doc").as("id_b"),
      col("terms").as("terms_b"), col("wns").as("wns_b"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.sparseDotLong(
          col("terms_a"), col("wns_a"), col("terms_b"), col("wns_b"))
          .cast("double") / lit(1e12), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
