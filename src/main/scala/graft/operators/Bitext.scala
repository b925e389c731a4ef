package graft.operators

import graft.plans.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, Encoders}

/** Margin-based bitext (parallel-pair) mining (SURVEY §2 q99; Artetxe &
  * Schwenk 2019, "Margin-based Parallel Corpus Mining with Multilingual
  * Sentence Embeddings" — the LASER/CCMatrix recipe).
  *
  * Given two embedding collections X and Y (two languages encoded into one
  * space), raw cosine is a poor pair score: some sentences are "hubs" that
  * are close to everything. The margin criterion normalizes each candidate
  * cosine by the local neighborhood density of BOTH endpoints:
  *
  *   margin(x, y) = cos(x, y) / ( (meanTopK(x→Y) + meanTopK(y→X)) / 2 )
  *
  * and a pair is mined iff each side is the other's best-margin candidate
  * (mutual argmax) and the margin clears a threshold (CCMatrix used ≈1.06).
  *
  * Determinism discipline (the q24/q25 rounding rules, so a DuckDB twin
  * reproduces the result hash-exactly):
  *  - candidate cosines are rounded to 6 dp BEFORE ranking; top-k ties
  *    break by neighbor id ascending;
  *  - the neighborhood means accumulate the 6-dp cosines as
  *    DECIMAL(9,6) — an order-independent exact sum — then divide as
  *    DOUBLE, so partitioning never perturbs the mean's last bit;
  *  - margins are rounded to 6 dp before the argmax; argmax ties break by
  *    id ascending. Both engines then agree bit-for-bit.
  *
  * Scale shape (100 TB): the scoring pass here is the declared-exact
  * all-pairs baseline (X ⋈ broadcast(Y) with the codegen'd
  * [[graft.plans.CosineSimilarity]] kernel), the same contract as q24/q25
  * — at production scale the candidate generation swaps to the LSH /
  * IVF machinery (q24b/q26/q27) with everything downstream of the scored
  * (xid, yid, cos) stream unchanged. Both directions' top-k run as
  * bounded [[BoundedTopK]] aggregations (map-side partial, O(k) rows per
  * group per partition on the shuffle — never a per-group window sort),
  * and everything after candidate generation is O(k·(|X|+|Y|)) rows. The
  * scored stream is NOT materialized: it is O(|X|·|Y|) rows, so the two
  * directional aggregations recompute it from the `localCheckpoint`ed
  * inputs instead — two bounded passes beat one quadratic spill.
  */
object Bitext {

  /** Cross-collection LSH candidate generator for [[marginMine]] — the
    * registered 100 TB scale path (q99b). Both collections explode to
    * (id, bucket) sign-bit keys — `tables` ints per vector, never the
    * vector itself — and candidates are the bucket colliders, exactly the
    * q26 machinery turned bipartite: the X side hashes into exact buckets,
    * the Y side additionally probes `probes` flip-1-bit neighbor buckets
    * per table (multiprobe recall without re-exploding the X side).
    *
    * Candidate-volume bound: |cand| ≤ Σ_buckets f_X(b)·f_Y(b). With b
    * sign-bits per table the expected per-table bucket load is |X|/2^b ×
    * |Y|/2^b × 2^b collisions, so E|cand| ≤ L·(1+probes)·|X|·|Y|/2^b —
    * at b = 6, L = 12, probes = 2 that is |X|·|Y|/1.8, and on CLUSTERED
    * real bitext (where LSH buckets align with clusters) far below it;
    * the join is bucket-keyed, so no single task exceeds the hottest
    * bucket product, AQE-splittable.
    */
  def lshCandidates(bits: Int = 6, tables: Int = 12, probes: Int = 2)(
      x: DataFrame, y: DataFrame): DataFrame = {
    val xb = x.select(col("xid"),
      explode(VectorFunctions.lshBuckets(col("xv"), bits, tables)).as("bucket"))
    val yb = y.select(col("yid"),
      explode(VectorFunctions.lshProbeBuckets(col("yv"), bits, tables, probes))
        .as("bucket"))
    xb.join(yb, Seq("bucket")).select("xid", "yid").distinct()
  }

  /** Mine mutual-best margin pairs between `xs` and `ys`.
    * Returns (x_id, y_id, margin) with margin ≥ threshold, 6-dp rounded.
    *
    * `candidates` swaps the scored stream's pair source: `None` is the
    * declared-exact all-pairs baseline (the q24/q25 contract); `Some(gen)`
    * scores only the generator's (xid, yid) pairs — [[lshCandidates]] is
    * the production generator — with everything downstream (top-k,
    * neighborhood means, margins, mutual argmax) unchanged. Approximate
    * top-k neighborhoods are the standard CCMatrix trade: the margin
    * denominator is then the mean over the RETRIEVED neighborhood, gated
    * against the exact path by [[marginMineGate]].
    */
  def marginMine(
      xs: DataFrame, ys: DataFrame,
      idCol: String, vecCol: String,
      k: Int = 4, threshold: Double = 1.0,
      candidates: Option[(DataFrame, DataFrame) => DataFrame] = None): DataFrame = {
    // A small corpus parquet scan often lands in 1-2 partitions, which
    // serializes the broadcast-join scoring below (one task per streamed
    // partition — the embeddingNearDupPairs lesson, opt guide §2.5 input
    // skew). Spread the STREAMED side over the available slots before
    // pinning it; y broadcasts, so its layout doesn't matter.
    val x = xs.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("xid"), col(vecCol).as("xv"))
      .repartition(xs.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint()
    val y = ys.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("yid"), col(vecCol).as("yv")).localCheckpoint()

    // One logical scored stream, consumed twice (see scaladoc: recomputing
    // two broadcast-join passes over checkpointed inputs is the scale-safe
    // choice vs materializing the quadratic pair set).
    val scored = candidates match {
      case None =>
        x.join(broadcast(y))
          .select(col("xid"), col("yid"),
            round(VectorFunctions.cosineSimilarity(col("xv"), col("yv")), 6).as("c"))
      case Some(gen) =>
        gen(x, y).join(x, Seq("xid")).join(y, Seq("yid"))
          .select(col("xid"), col("yid"),
            round(VectorFunctions.cosineSimilarity(col("xv"), col("yv")), 6).as("c"))
    }

    val topk = udaf(
      new BoundedTopK[Scored](k)((a, b) =>
        a.score > b.score || (a.score == b.score && a.id < b.id)),
      Encoders.product[Scored])

    // Forward: x's top-k in Y; backward: y's top-k in X. Each keeps the
    // (neighbor, cos) pairs so the neighborhood mean and the candidate set
    // come out of ONE aggregation per direction.
    def direction(groupCol: String, nbrCol: String): (DataFrame, DataFrame) = {
      val kept = scored.groupBy(col(groupCol))
        .agg(topk(col(nbrCol), col("c")).as("nn"))
        .select(col(groupCol), explode(col("nn")).as("s"))
        .select(col(groupCol), col("s.id").as(nbrCol), col("s.score").as("c"))
      val mean = kept.groupBy(col(groupCol))
        .agg((sum(col("c").cast(DecimalType(9, 6))).cast("double") /
          count(lit(1))).as(s"m_$groupCol"))
      (kept, mean)
    }
    val (fwd, mx) = direction("xid", "yid")
    val (bwd, my) = direction("yid", "xid")

    // Candidate pairs = union of both directions' kept lists (pair-level
    // distinct: a pair found in both directions scores once).
    val cand = fwd.select("xid", "yid", "c")
      .unionByName(bwd.select("xid", "yid", "c"))
      .distinct()

    val margins = cand
      .join(mx, "xid").join(my, "yid")
      .filter(col("m_xid") > 0 && col("m_yid") > 0)
      .select(col("xid"), col("yid"),
        round(col("c") / ((col("m_xid") + col("m_yid")) / 2), 6).as("margin"))

    // Mutual argmax, bounded (k=1) per side — no window, no join-back.
    val best1 = udaf(
      new BoundedTopK[Scored](1)((a, b) =>
        a.score > b.score || (a.score == b.score && a.id < b.id)),
      Encoders.product[Scored])
    def bestPer(groupCol: String, nbrCol: String): DataFrame =
      margins.groupBy(col(groupCol))
        .agg(best1(col(nbrCol), col("margin")).as("b"))
        .select(col(groupCol), col("b")(0).getField("id").as(nbrCol),
          col("b")(0).getField("score").as("margin"))

    bestPer("xid", "yid").alias("bx")
      .join(bestPer("yid", "xid").alias("by"),
        col("bx.xid") === col("by.xid") && col("bx.yid") === col("by.yid"))
      .filter(col("bx.margin") >= threshold)
      .select(col("bx.xid").as("x_id"), col("bx.yid").as("y_id"),
        col("bx.margin").as("margin"))
  }

  /** The q99 shape on the synthetic tables: labels 0–4 play the "source
    * language" collection, 5–9 the "target" — a deterministic split that a
    * SQL twin reproduces.
    */
  def mineOnLabels(emb: DataFrame, k: Int = 4, threshold: Double = 1.0): DataFrame = {
    val xs = emb.filter(col("label") < 5)
    val ys = emb.filter(col("label") >= 5)
    marginMine(xs, ys, "vec_id", "embedding", k, threshold)
  }

  /** q99b: the LSH-candidate scale path, gated against the exact twin —
    * one driver-checkable row (n_exact, recall_ok), the q26/q24b gate
    * shape. `n_exact` is genuinely recomputed by the oracle (the q99
    * SQL pipeline counted over the same subsample); `recall_ok` asserts
    * the LSH-candidate mine recovers ≥ `floor` of the exact path's
    * mutual-best pairs. The floor is calibrated on the near-uniform
    * synthetic embeddings — the angular LSH worst case; clustered real
    * bitext sits far above it (BitextSpec pins 1.0 recall on a
    * clustered corpus).
    *
    * BOTH paths run over the `sampleIds` id-bounded subsample: mutual-
    * best-margin is a GLOBAL property (a full-corpus LSH mine restricted
    * to a subset is not comparable to an exact mine of the subset — the
    * true partner may sit outside it), so unlike q24b's local pair gate
    * the exact side cannot be subset-only against a full approx side.
    * Bounding both keeps the gate O(sampleIds²) at ANY corpus scale —
    * at driver scale (sf0.01, 2000 vectors) the bound is not binding and
    * the gate covers the whole table. Production mining calls
    * [[marginMine]] with [[lshCandidates]] directly; this entry is the
    * calibration gate.
    */
  def marginMineGate(
      emb: DataFrame, k: Int = 4, threshold: Double = 1.0,
      floor: Double = 0.6, sampleIds: Int = 2000): DataFrame = {
    val sub = emb.filter(col("vec_id") < sampleIds)
    val xs = sub.filter(col("label") < 5)
    val ys = sub.filter(col("label") >= 5)
    val exact = marginMine(xs, ys, "vec_id", "embedding", k, threshold)
      .select("x_id", "y_id").localCheckpoint()
    val approx = marginMine(xs, ys, "vec_id", "embedding", k, threshold,
      candidates = Some(lshCandidates()))
      .select("x_id", "y_id")
    val hits = exact.join(approx, Seq("x_id", "y_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(hits)
      .select(col("n_exact"),
        (col("n_hit") >= col("n_exact") * floor).as("recall_ok"))
  }
}
