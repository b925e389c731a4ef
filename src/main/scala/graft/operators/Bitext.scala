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

  /** Mine mutual-best margin pairs between `xs` and `ys`.
    * Returns (x_id, y_id, margin) with margin ≥ threshold, 6-dp rounded.
    */
  def marginMine(
      xs: DataFrame, ys: DataFrame,
      idCol: String, vecCol: String,
      k: Int = 4, threshold: Double = 1.0): DataFrame = {
    val x = xs.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("xid"), col(vecCol).as("xv")).localCheckpoint()
    val y = ys.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("yid"), col(vecCol).as("yv")).localCheckpoint()

    // One logical scored stream, consumed twice (see scaladoc: recomputing
    // two broadcast-join passes over checkpointed inputs is the scale-safe
    // choice vs materializing the quadratic pair set).
    val scored = x.join(broadcast(y))
      .select(col("xid"), col("yid"),
        round(VectorFunctions.cosineSimilarity(col("xv"), col("yv")), 6).as("c"))

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
}
