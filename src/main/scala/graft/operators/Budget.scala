package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Epoch-capped token-budget allocation — the "data recipe" solver behind
  * balanced multilingual / multi-source training mixtures (SURVEY §2
  * q100; the discipline published for Dolma / LLaMA-style recipes:
  * sample every group toward an equal token share, but never repeat any
  * group beyond `maxEpochs` passes over its data).
  *
  * Allocation (classic water-filling with per-group caps, EQUAL weights):
  * each group g with `tok_g` total tokens has cap `E·tok_g`; the budget B
  * is split equally among groups, groups whose cap is below their share
  * are frozen AT the cap, and the freed budget re-spreads over the rest.
  * Closed form: sort groups by cap ascending — group i (1-based, S
  * groups, cumulative cap c_i) is capped iff
  * `cap_i · (S − i + 1) ≤ B − c_{i−1}`, a condition monotone in i, so
  * the capped set is a prefix; the k capped groups spend c_k and every
  * uncapped group gets `(B − c_k) div (S − k)`. ALL LONG ARITHMETIC —
  * no float enters the allocation, so any engine reproduces the quotas
  * bit-for-bit (the div-floor slack, < S tokens, is documented unspent).
  *
  * Materialization: quota_g = r_full full epochs (`quota div tok`) plus a
  * partial epoch of `quota mod tok` tokens filled in deterministic
  * [[Sampling.idHash]] LCG order (id tie-break) — a doc enters the
  * partial epoch iff its running token total stays within the remainder
  * (docs are never split). Output is the full audit spine
  * (doc_id, group, n_tokens, n_repeats ≥ 0).
  *
  * Scale shape (100 TB): group totals are one map-side-combined
  * aggregation; the water-fill runs on S rows (driver-held, the q86
  * "model is small, corpus never collects" rule). The per-group running
  * token sum is the [[Packing.lengthBatches]] banded prefix sum — hash
  * buckets bound every window partition to n_g/buckets rows, the driver
  * prefix-scans one row per (group, bucket), and the starts broadcast
  * back — so no per-group corpus-sized window sort exists anywhere.
  */
object Budget {

  /** budgetNum/budgetDen scale total tokens into the budget:
    * B = tok_total · budgetNum div budgetDen (integer, engine-exact).
    */
  def epochCappedAllocation(
      docs: DataFrame, groupCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text",
      budgetNum: Long = 16L, budgetDen: Long = 10L,
      maxEpochs: Long = 2L, buckets: Int = 64): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && maxEpochs > 0, "positive budget and epochs")
    val spark = docs.sparkSession
    import spark.implicits._
    val width = Sampling.HashMod / buckets + 1

    val base = docs
      .filter(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"), col(groupCol).as("grp"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("__h", Sampling.idHash(col("id")))
      .withColumn("__b", expr(s"__h div ${width}L"))

    // One bounded aggregate: token total per (group, bucket). Feeds BOTH
    // the water-fill (summed per group) and the prefix starts.
    val bucketTotals = base.groupBy(col("grp"), col("__b"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val tokPerGroup = bucketTotals.groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._3).sum }
      .filter(_._2 > 0)
    val s = tokPerGroup.size.toLong
    if (s == 0)
      return base.select(col("id").as(idCol), col("grp").as(groupCol),
        col("n_tokens"), lit(0L).as("n_repeats")).limit(0)
    val budget = tokPerGroup.values.sum * budgetNum / budgetDen

    // Water-fill on S driver rows, all Long.
    val sorted = tokPerGroup.toSeq
      .map { case (g, tok) => (g, tok, maxEpochs * tok) }
      .sortBy { case (g, _, cap) => (cap, g) }
    var cPrev = 0L
    var k = 0
    sorted.zipWithIndex.takeWhile { case ((_, _, cap), i0) =>
      val stillCapped = cap * (s - i0) <= budget - cPrev
      if (stillCapped) { cPrev += cap; k += 1 }
      stillCapped
    }
    val share = if (k < s) (budget - cPrev) / (s - k) else 0L
    val quotas = sorted.zipWithIndex.map { case ((g, tok, cap), i0) =>
      val quota = if (i0 < k) cap else share
      (g, quota / tok, quota % tok) // (group, full epochs, partial tokens)
    }
    val quotaDf = quotas.toDF("grp", "__rfull", "__rpart")

    // Banded prefix sum of n_tokens per group in (hash, id) order.
    val w = Window.partitionBy(col("grp"), col("__b"))
      .orderBy(col("__h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = base.withColumn("__cs", sum(col("n_tokens")).over(w))

    val starts = {
      val byGroup = bucketTotals.sortBy(t => (t._1, t._2))
      var prevGrp: String = null
      var acc = 0L
      byGroup.map { case (g, b, t) =>
        if (g != prevGrp) { prevGrp = g; acc = 0L }
        val st = acc; acc += t
        (g, b, st)
      }.toSeq
    }
    val startDf = starts.toDF("grp", "__b", "__start")

    within
      .join(broadcast(startDf), Seq("grp", "__b"))
      .join(broadcast(quotaDf), Seq("grp"))
      .select(
        col("id").as(idCol), col("grp").as(groupCol), col("n_tokens"),
        (col("__rfull") +
          when(col("__start") + col("__cs") <= col("__rpart"), 1L).otherwise(0L)
        ).as("n_repeats"))
  }
}
