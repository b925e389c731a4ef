package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling for training-data pipelines (SURVEY §2
  * `q35_stratified_sample`).
  *
  * `df.sample()` is nondeterministic across runs/partitionings, which
  * makes training corpora unreproducible. This samples by ranking rows
  * inside each stratum on a SPLITMIX-style arithmetic hash of the row id —
  * pure integer math, so the exact same rows are chosen on any engine,
  * any partitioning, any day. One shuffle (the per-stratum window).
  *
  * At 100 TB scale note: an exact-N-per-stratum sample needs the
  * per-stratum sort a window provides; when an approximate fraction is
  * enough, `hashFraction` filters on the hash alone — no shuffle at all.
  */
object Sampling {

  /** 64-bit multiplicative mix kept within Long range via modular
    * arithmetic that DuckDB reproduces exactly: (id * PRIME_A + PRIME_B)
    * mod 2^31-1. Positive, uniform enough for sampling.
    *
    * The id is reduced mod 2^31-1 BEFORE the multiply: (id mod M)·A ≡
    * id·A (mod M), so the value is unchanged where the raw product fits,
    * and for |id| > ~8.4e9 (xxhash-derived ids, high-partition
    * monotonically_increasing_id) the raw product would overflow Long —
    * ANSI Spark throws, DuckDB errors on BIGINT overflow — while the
    * reduced form stays ≤ ~2^61 for the full 64-bit id space.
    */
  val HashMod: Long = 2147483647L // 2^31 - 1 (Mersenne prime)
  val HashMulA: Long = 1103515245L
  val HashAddB: Long = 12345L
  def idHash(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(HashMod)) * HashMulA + HashAddB, lit(HashMod))

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by hash order with id tie-break. `idCol` must be unique.
    *
    * Scale shape: a bounded top-k aggregator picks the n winning
    * (hash, id) keys per stratum — at most n keys leave each input
    * partition per stratum, nothing is sorted — and a broadcast semi-join
    * pulls the winners' full rows on a second scan. The windowed
    * formulation (shuffle EVERY row wide, sort every stratum) is what this
    * replaces; the sampled ids total strata × n, safely broadcastable.
    */
  def stratifiedN(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    val topk = udaf(
      new BoundedTopK[(Long, Long)](n)((a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)),
      org.apache.spark.sql.Encoders.product[(Long, Long)])
    val winners = df
      .groupBy(col(strataCol))
      .agg(topk(idHash(col(idCol)), col(idCol).cast("long")).as("w"))
      .select(explode(col("w")).as("w"))
      .select(col("w._2").as("__sample_id"))
    df.join(
      broadcast(winners),
      col(idCol).cast("long") === col("__sample_id"), "left_semi")
  }

  /** Shuffle-free approximate fraction: keeps rows whose id-hash falls
    * under fraction × HashMod. Deterministic; expected fraction per
    * stratum without grouping.
    */
  /** Domain-separated FRACTION hash: [[idHash]] composed with a
    * full-period second stage (see [[assignSplits]] for the measured
    * failure mode) — a cut-below-a-threshold selection must never ride
    * raw [[idHash]] (it would keep ~all of a rank-sampler's output) NOR
    * the split's composed hash (the two threshold cuts would correlate
    * 100%: `assignSplits(hashFraction(docs, 0.5))` would put every
    * survivor in 'train'). Each threshold purpose gets its OWN
    * multiplier; the three composed hashes here (split 48271, fraction
    * 69621, epoch 16807 — all full-period mod M) are measured pairwise
    * independent (low-band overlap 0.199–0.204 at a 0.2 expectation).
    */
  val HashMulFraction: Long = 69621L
  val HashAddFraction: Long = 7L

  def fractionHash(id: Column): Column =
    pmod(idHash(id) * HashMulFraction + HashAddFraction, lit(HashMod))

  def hashFraction(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(fractionHash(col(idCol)) < lit((fraction * HashMod).toLong))
  }

  /** Weighted sample of `n` rows per stratum, deterministic AND
    * engine-reproducible: each row gets priority `idHash(id) / weight`
    * (scaled-uniform priority — one IEEE double division, bit-identical
    * on any engine; selection chance grows with weight, the
    * small-fraction regime of Efraimidis–Spirakis priority sampling,
    * whose exact `u^(1/w)` key would hinge on cross-engine `pow`), and
    * the n SMALLEST priorities win. Same bounded-aggregator shape as
    * [[stratifiedN]]: at most n (priority, id) pairs leave each partition
    * per stratum, winners pull full rows by broadcast semi-join — full
    * rows never shuffle, nothing sorts. Rows with weight <= 0 or NULL are
    * never sampled.
    */
  /** Temperature-scaled MIXTURE resampling — the multilingual/DoReMi-style
    * source-balancing step: sample `targetTotal` documents with per-source
    * quotas ∝ n_s^τ. τ = 1 reproduces the natural mixture; τ = 0.5 (the
    * multilingual-pretraining staple) up-samples small sources relative to
    * their size so the head can't drown the tail. Only τ ∈ {0.5, 1} is
    * accepted: quota arithmetic must be bit-identical cross-engine, and
    * IEEE `sqrt` is correctly rounded everywhere while libm `pow` is not.
    *
    * Determinism discipline: weights are rounded to 6 dp and summed as
    * DECIMAL (exact, order-independent — a double Σ would depend on
    * aggregation order), then quota_s = floor(T · w_s / W) in ONE double
    * multiply + divide over exact operands — every engine computes the
    * same quotas, and inside each source the q35 id-hash rank picks the
    * same rows. Floor-rounding leaves Σ quota ≤ T by at most one doc per
    * source (documented, not redistributed — redistribution would need a
    * cross-source order, a needless determinism hazard).
    *
    * Shape: one count aggregation (rows: one per source), quotas broadcast
    * back, per-source rank over 24-byte (source, hash, id) keys, winners
    * pull full rows via broadcast semi-join — full rows never shuffle.
    * The winner set is `targetTotal` ids (16 bytes each); past broadcast
    * size (~hundreds of millions of ids) swap the final semi-join for a
    * shuffled left-semi — the quota machinery is unchanged.
    */
  def mixtureResample(
      df: DataFrame, strataCol: String, idCol: String,
      targetTotal: Long, temperature: Double = 0.5): DataFrame = {
    require(temperature == 0.5 || temperature == 1.0,
      "only tau in {0.5, 1}: cross-engine quota determinism needs correctly-rounded ops (sqrt), not libm pow")
    val counts = df.groupBy(col(strataCol).as("__s"))
      .agg(count(lit(1)).as("__n"))
    val w =
      if (temperature == 1.0) col("__n").cast("decimal(18,6)")
      else round(sqrt(col("__n")), 6).cast("decimal(18,6)")
    val weighted = counts.select(col("__s"), w.as("__w"))
    // "__tot", not "__W": Spark resolution is case-insensitive by default,
    // so "__W" next to "__w" is an ambiguous reference
    val tot = weighted.agg(sum(col("__w")).as("__tot"))
    val quotas = weighted.crossJoin(broadcast(tot))
      .select(col("__s"),
        floor(lit(targetTotal.toDouble) * (col("__w").cast("double") / col("__tot").cast("double")))
          .cast("long").as("__quota"))
    val ranked = df
      .select(col(strataCol).as("__s"), idHash(col(idCol)).as("__h"),
        col(idCol).cast("long").as("__id"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__s"))
          .orderBy(col("__h"), col("__id"))))
    val winners = ranked.join(quotas, Seq("__s"))
      .filter(col("__rn") <= col("__quota"))
      .select(col("__id").as("__sample_id"))
    df.join(
      broadcast(winners),
      col(idCol).cast("long") === col("__sample_id"), "left_semi")
  }

  /** Deterministic train/val/test assignment — the split every training
    * run needs to be REPRODUCIBLE and leak-free: a document's split is a
    * pure function of its id (not of partitioning, sampling order, or the
    * rest of the corpus), so reruns, backfills, and incremental ingest
    * can never move a doc across the eval boundary. The split hash is
    * [[idHash]] composed with a SECOND, DIFFERENT-multiplier LCG step
    * (Park–Miller MINSTD 48271) — deliberate DOMAIN SEPARATION from the
    * single-application hash every rank-sampler orders by: a pipeline
    * that samples by idHash rank and then splits on the same hash keeps
    * exactly the low-hash tail, so the whole sample lands below the
    * train threshold (measured live composing `stratifiedN` → split at
    * sf0.1: 299/1/0 instead of ~240/30/30). Re-applying the SAME
    * multiplier does NOT fix it — dense consecutive ids put the
    * low-hash winners on the LCG's lattice (three-distance structure),
    * and the same multiplier maps that lattice onto itself (measured:
    * 300/0/0) — while the MINSTD second stage spreads the same winners
    * 242/28/30. The composed h maps to a basis-point bucket
    * (h₂·10⁴ div M ∈ [0, 10⁴)); cumulative fraction thresholds cut it.
    * Zero shuffles — a per-row expression.
    *
    * `fractions` are (label, basis points) in assignment order and must
    * sum to 10000 (exact integer bookkeeping, no float thresholds).
    *
    * FORMULA VERSION NOTE (r9 break): the MINSTD second stage CHANGED the
    * split hash — a corpus persisted under the pre-r9 single-stage formula
    * re-splits differently under this one, which violates this operator's
    * own "a doc never moves across the eval boundary" contract for that
    * already-persisted data. The old formula was withdrawn rather than
    * versioned because it is UNSAFE (it correlates 100% with every
    * rank-sampler's order — the composition bug the second stage fixes);
    * external corpora split under it should persist their existing split
    * column and treat this formula as a new split universe, not re-derive.
    */
  val HashMulSplit: Long = 48271L // Park–Miller MINSTD, full period mod M
  val HashAddSplit: Long = 11L

  def assignSplits(
      df: DataFrame, idCol: String,
      fractions: Seq[(String, Int)] =
        Seq(("train", 8000), ("val", 1000), ("test", 1000))): DataFrame = {
    require(fractions.map(_._2).sum == 10000, "fractions must sum to 10000 bp")
    // h1 < M, so h1·48271 + 11 ≪ 2⁶³ — no pre-reduction needed
    val bp = expr(
      s"(pmod(pmod(pmod(CAST(`$idCol` AS BIGINT), ${HashMod}L) * ${HashMulA}L + ${HashAddB}L, ${HashMod}L)" +
        s" * ${HashMulSplit}L + ${HashAddSplit}L, ${HashMod}L) * 10000L) div ${HashMod}L")
    val cuts = fractions.scanLeft(0)(_ + _._2).tail
    val label = fractions.zip(cuts).init.foldRight(lit(fractions.last._1): Column) {
      case (((name, _), cut), rest) => when(bp < cut, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Reproducible GLOBAL shuffle order for training: each row's ordinal in
    * the corpus ordered by (idHash, id) — "shuffle the corpus" as a pure
    * function of ids, identical on any engine, partitioning, or day (the
    * property `df.orderBy(rand())` can never give you back).
    *
    * The ordinal is a DISTRIBUTED PREFIX SUM over fixed-width hash-range
    * buckets (the q64 Packing discipline — never a single-partition
    * `Window.orderBy`): hash space [0, 2³¹−1) splits into `buckets` equal
    * ranges (value-based, no sampled boundaries), one row_number window
    * per bucket, bucket counts prefix-scanned on the driver (bounded: one
    * row per bucket), starts broadcast back. Returns df + `ordinal`.
    *
    * `epoch` gives multi-epoch training a FRESH reproducible order per
    * pass: the sort key is idHash composed with `epoch` LCG steps on the
    * epoch-specific multiplier (epoch 0 = the oracled base order). Each
    * extra step is a fixed order-destroying bijection mod M — an AFFINE
    * salt (`+ e·Δ` on the hash or the id) would NOT work: adding mod M
    * only rotates the circle, so consecutive "epochs" would replay
    * almost the same order with one cut point moved. The multiplier is
    * deliberately NEITHER the split's nor the fraction's (16807 vs
    * 48271/69621): stepping with the split multiplier would make the
    * epoch-1 prefix a deterministic subset of the train split.
    */
  val HashMulEpoch: Long = 16807L
  val HashAddEpoch: Long = 3L

  def shuffleOrder(
      df: DataFrame, idCol: String, buckets: Int = 256,
      epoch: Int = 0): DataFrame = {
    require(epoch >= 0, "epoch must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val width = HashMod / buckets + 1
    val he = (0 until epoch).foldLeft(idHash(col(idCol)))((h, _) =>
      pmod(h * HashMulEpoch + HashAddEpoch, lit(HashMod)))
    val hashed = df.select(
      col(idCol).cast("long").as("__id"), he.as("__h"))
      .withColumn("__b", expr(s"__h div ${width}L"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h"), col("__id"))
    val within = hashed.withColumn("__rn", row_number().over(w).cast("long"))
    val totals = hashed.groupBy(col("__b")).agg(count(lit(1)).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    if (totals.isEmpty) // empty input: empty output, same shape
      return df.withColumn("ordinal", lit(0L)).limit(0)
    val starts = totals.toSeq
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).map(p => (p(1)._1, p(0)._2)).toSeq
    val startDf = starts.toDF("__b", "__start")
    df.join(
      within.join(broadcast(startDf), Seq("__b"))
        .select(col("__id"), (col("__start") + col("__rn") - 1).as("ordinal")),
      col(idCol).cast("long") === col("__id"))
      .drop("__id")
  }

  /** CURRICULUM order (SURVEY §2 q108): global easy-first ordinal by a
    * difficulty score, with a deterministic hash-shuffle WITHIN each
    * difficulty band — the "sequence-length warmup" / curriculum-learning
    * prep step (train on easy docs first, but never in id order inside a
    * band, which would correlate adjacent batches with ingest order).
    *
    * Same distributed-prefix-sum shape as [[shuffleOrder]], with the
    * bucket = (score VALUE, idHash sub-range): within a band the hash
    * range [0, 2³¹−1) splits into `buckets` equal sub-ranges, so window
    * parallelism is bands × buckets, NOT bands — a band holding 1/91 of
    * a 100 TB corpus must never become one sort task. Sub-ranging by the
    * hash preserves the (score, idHash, id) total order exactly: within
    * a band, sub-buckets are ascending hash ranges, and the driver
    * prefix-scans counts in (score, bucket) order. The driver collect is
    * one row per (DISTINCT score × occupied bucket) — the caller's
    * contract is a bounded-cardinality integer difficulty (token counts,
    * perplexity bands, quantized deciles, all ≤ a few thousand values at
    * any corpus size; a continuous score must be quantized first, q68's
    * banding or `round(score, 2)`), so ≤ scores × buckets rows. NULL
    * scores order LAST (hardest), after every real band.
    * Returns df + `ordinal` (0-based).
    */
  def curriculumOrder(
      df: DataFrame, idCol: String, scoreCol: String, buckets: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val width = HashMod / buckets + 1
    val hashed = df.select(
      col(idCol).cast("long").as("__id"),
      coalesce(col(scoreCol).cast("long"), lit(Long.MaxValue)).as("__s"),
      idHash(col(idCol)).as("__h"))
      .withColumn("__b", expr(s"__h div ${width}L"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s"), col("__b")).orderBy(col("__h"), col("__id"))
    val within = hashed.withColumn("__rn", row_number().over(w).cast("long"))
    val totals = hashed.groupBy(col("__s"), col("__b"))
      .agg(count(lit(1)).as("t"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    if (totals.isEmpty)
      return df.withColumn("ordinal", lit(0L)).limit(0)
    val starts = totals.toSeq
      .scanLeft(((Long.MinValue, Long.MinValue), 0L)) {
        case ((_, acc), (sb, t)) => (sb, acc + t)
      }
      .sliding(2).map(p => (p(1)._1._1, p(1)._1._2, p(0)._2)).toSeq
    val startDf = starts.toDF("__s", "__b", "__start")
    df.join(
      within.join(broadcast(startDf), Seq("__s", "__b"))
        .select(col("__id"), (col("__start") + col("__rn") - 1).as("ordinal")),
      col(idCol).cast("long") === col("__id"))
      .drop("__id")
  }

  /** Deterministic MIXTURE INTERLEAVE (SURVEY §2 q115) — the data-mixing
    * SCHEDULE: q74 decides how MANY docs each source contributes, this
    * decides WHEN they appear in the training order. Multi-source
    * training reads sources at fixed rates (the DoReMi/Pile mixture
    * applied per step, not per corpus); materializing that order makes it
    * reproducible and resumable (the q80 contract) instead of an
    * interleaving the reader improvises at run time.
    *
    * Stride scheduling (Waldspurger & Weihl 1995): stratum s with weight
    * `bp_s` basis points places its k-th doc (k = 0-based position in
    * s's q80 hash order) at key (2k+1)·10⁶ div (2·bp_s) — evenly spaced
    * strides of 10⁶/bp_s centered on the half-stride, so ANY prefix of
    * the global (key, id) order holds ≈ L·bp_s/10⁴ docs of s (bounded
    * lag, spec-asserted ±2), and a stratum that runs out simply stops
    * contributing. All-long arithmetic: k is exact, the key is one
    * integer division, ties break on (key, id) — engine-,
    * partitioning- and run-independent, hash-exact against the SQL twin.
    *
    * Scale shape: per-stratum positions AND the global ordinal both run
    * as (partition key, hash-sub-bucket) windows over driver prefix-sums
    * — [[curriculumOrder]]'s shape twice, never a single-partition
    * window. The second stage buckets by KEY RANGE, and stride keys are
    * uniform by construction (≈ total/maxKey per unit), so its tasks
    * are balanced at any weight skew. Driver holds strata × `buckets`
    * count rows (the [[curriculumOrder]] bounded-cardinality contract on
    * `strataCol`). Overflow-safe to k ≈ 4.6×10¹² docs per stratum.
    * Returns df + `ordinal` (0-based, dense).
    */
  def mixtureInterleave(
      df: DataFrame, strataCol: String, idCol: String,
      bp: Seq[(String, Int)], buckets: Int = 256): DataFrame = {
    require(bp.map(_._2).sum == 10000, "stratum weights must sum to 10000 bp")
    require(bp.forall(_._2 > 0), "stratum weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val width = HashMod / buckets + 1
    val hashed = df.select(
      col(idCol).cast("long").as("__id"),
      col(strataCol).cast("string").as("__s"),
      idHash(col(idCol)).as("__h"))
      .withColumn("__b", expr(s"__h div ${width}L"))
      .localCheckpoint()
    val totals = hashed.groupBy(col("__s"), col("__b"))
      .agg(count(lit(1)).as("t"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    if (totals.isEmpty)
      return df.withColumn("ordinal", lit(0L)).limit(0)
    val bpMap = bp.toMap
    val missing = totals.map(_._1._1).distinct.filterNot(bpMap.contains)
    require(missing.isEmpty, s"no weight for strata: ${missing.mkString(",")}")
    // per-stratum running starts, reset at each stratum boundary
    val startRows = {
      var cur: String = null; var acc = 0L
      totals.toSeq.map { case ((s, b), t) =>
        if (s != cur) { cur = s; acc = 0L }
        val st = acc; acc += t; (s, b, st)
      }
    }
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s"), col("__b")).orderBy(col("__h"), col("__id"))
    val keyed = hashed
      .withColumn("__rn", row_number().over(w1).cast("long"))
      .join(broadcast(startRows.toDF("__s", "__b", "__start")), Seq("__s", "__b"))
      .join(broadcast(bp.toDF("__s", "__bp")), Seq("__s"))
      .withColumn("__k", col("__start") + col("__rn") - 1)
      .withColumn("__key",
        expr("((__k * 2L + 1L) * 1000000L) div (CAST(__bp AS BIGINT) * 2L)"))
    val nByS = totals.groupBy(_._1._1).map { case (s, rs) => s -> rs.map(_._2).sum }
    val maxKey = nByS.map { case (s, n) =>
      ((2L * n - 1L) * 1000000L) / (2L * bpMap(s))
    }.max
    val kbWidth = maxKey / buckets + 1
    val keyedB = keyed
      .withColumn("__kb", expr(s"__key div ${kbWidth}L"))
      .localCheckpoint()
    val starts2 = {
      var acc = 0L
      keyedB.groupBy(col("__kb")).agg(count(lit(1)).as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        .toSeq.map { case (b, t) => val st = acc; acc += t; (b, st) }
    }
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__kb")).orderBy(col("__key"), col("__id"))
    df.join(
      keyedB
        .withColumn("__rn2", row_number().over(w2).cast("long"))
        .join(broadcast(starts2.toDF("__kb", "__start2")), Seq("__kb"))
        .select(col("__id"), (col("__start2") + col("__rn2") - 1).as("ordinal")),
      col(idCol).cast("long") === col("__id"))
      .drop("__id")
  }

  def weightedN(
      df: DataFrame, strataCol: String, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    val topk = udaf(
      new BoundedTopK[(Double, Long)](n)((a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)),
      org.apache.spark.sql.Encoders.product[(Double, Long)])
    val winners = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(strataCol))
      .agg(topk(
        idHash(col(idCol)).cast("double") / col(weightCol).cast("double"),
        col(idCol).cast("long")).as("w"))
      .select(explode(col("w")).as("w"))
      .select(col("w._2").as("__sample_id"))
    df.join(
      broadcast(winners),
      col(idCol).cast("long") === col("__sample_id"), "left_semi")
  }
}
