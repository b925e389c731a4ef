package graft.operators

import graft.plans.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders}

/** IVF-flat approximate nearest neighbor over an embedding column — the
  * second ANN scale path beside [[Knn.lshTopK]] (SURVEY §2 `q27_knn_ivf`).
  *
  * Classic inverted-file design (the same shape faiss uses):
  *  1. TRAIN: k-means centroids from a bounded sample, on the driver —
  *     training data is O(sampleSize × dim), the full corpus never leaves
  *     executors;
  *  2. ASSIGN: every corpus vector gets its nearest centroid's cell id
  *     (one codegen'd expression, embarrassingly parallel);
  *  3. PROBE: each query scores only vectors in its `nprobe` nearest
  *     cells — the candidate set shrinks by ~nlist/nprobe versus a full
  *     scan, at the cost of recall (rows-only oracle, like q26).
  *
  * The cell assignment is deterministic (seeded sample, fixed iteration
  * count, ties to the lowest cell id).
  */
object IvfKnn {

  /** Driver-side Lloyd iterations over a seeded, id-ordered sample.
    * Cosine metric: all vectors and centroids are L2-normalized, so
    * nearest-by-dot == nearest-by-cosine.
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 10, sampleSize: Int = 4096): Array[Array[Float]] = {
    val sample = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<float>").as("v"))
      .orderBy(col("id"))
      .limit(sampleSize)
      .select(col("v"))
      .collect()
      .map(r => normalize(r.getSeq[Float](0).toArray))
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")

    // init: evenly spaced sample points (deterministic)
    var centroids = Array.tabulate(nlist)(c => sample(c * sample.length / nlist).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(nlist)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else normalize(sums(c).map(x => (x / counts(c)).toFloat))
      }
    }
    centroids
  }

  /** Above this nlist, [[coarseCentroidsForBuild]] switches from the
    * driver-side Lloyd to [[trainCentroidsAtScale]]: the driver loop is
    * O(iters · sample · nlist · d) SINGLE-THREADED, and a useful sample
    * grows with nlist (≥ a few dozen points per cell), so its cost is
    * effectively quadratic in nlist — fine at the q27/q107 registration
    * shape (nlist ≤ 32, milliseconds), the superlinear corner of the
    * whole index build at production nlist (SCALING_r14 §1: 104 s at
    * nlist=1024 on 200k vectors). Below the threshold the distributed
    * trainer's per-iteration job overhead would dominate instead.
    */
  val scaleTrainerThreshold = 128

  /** The coarse trainer an index BUILD uses: identical semantics —
    * deterministic sampled Lloyd, cosine metric, empty cell keeps its
    * centroid — with the engine picked by nlist (see
    * [[scaleTrainerThreshold]]). Registered query shapes (nlist ≤ 32)
    * stay on the original driver Lloyd bit-for-bit.
    */
  def coarseCentroidsForBuild(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Array[Array[Float]] =
    if (nlist >= scaleTrainerThreshold)
      trainCentroidsAtScale(corpus, idCol, vecCol, nlist)
    else trainCentroids(corpus, idCol, vecCol, nlist)

  /** Distributed sampled Lloyd for PRODUCTION nlist (thousands of cells;
    * the faiss guidance of tens of samples per cell) — the corpus never
    * leaves the executors and the driver only ever holds the MODEL
    * (nlist × d), never the sample:
    *
    *   - SAMPLE: deterministic hash thinning
    *     (`xxhash64(id) mod 10⁶ < rate` — the q35 idHash discipline:
    *     partitioning- and engine-independent, no driver RNG) down to
    *     ~`nlist · samplePerCell` vectors, L2-normalized on executors,
    *     materialized once via `localCheckpoint` (released after
    *     training) so `iters` passes don't re-read the corpus. On a
    *     cluster where executor loss mid-build matters, persist the
    *     thinned sample as a table first and train on that — the
    *     deterministic hash thinning makes the materialization itself
    *     reproducible, so either path trains identical centroids.
    *   - ASSIGN (per iteration): the codegen'd [[VectorFunctions
    *     .nearestCells]] kernel over the sample — embarrassingly
    *     parallel, the same expression the corpus routing uses.
    *   - UPDATE (per iteration): per-(cell, dim) sums of the 6-dp GRID
    *     projection of each normalized vector (the q86 long-grid
    *     discipline: exact integer sums, so the update is
    *     order-independent — a float sum here would make the trained
    *     centroids depend on partitioning). Map-side combine reduces the
    *     shuffle to nlist × d rows; the driver collects exactly the
    *     model size, re-normalizes, and broadcasts the next round's
    *     centroids inside the expression.
    *
    * Determinism: hash sample + pinned init (the nlist smallest-id
    * sample vectors) + exact-long update sums + fixed-order driver
    * normalization ⇒ a pure function of the input multiset, like
    * [[trainCentroids]] (IvfScaleSpec asserts run-to-run and
    * repartition invariance). The two trainers differ numerically (grid
    * rounding, init rule), so indexes must not mix them — an index
    * build picks one via [[coarseCentroidsForBuild]] and freezes it in
    * the persisted `_centroids` sidecar like any other build.
    *
    * Scale shape (100 TB): one thinning scan + `iters` scans of a
    * bounded sample; every stage's driver state and shuffle volume is
    * O(nlist · d). The per-iteration collect is nlist ROWS of
    * (cell, cnt, d sums) — measured 8.8 MB of driver heap at
    * nlist = 16 384 / d = 64, ~35 MB projected at 65 536
    * (ProbeTrainerDecade, SCALING_r16 §3) — the documented
    * bounded-model-collect contract. Per-iteration WALL is quadratic in
    * nlist (sample ∝ nlist × the O(nlist·d) kernel): ~39 s at 16 384 on
    * one 32-core box, so a 65k-cell train wants a cluster (the kernel
    * is embarrassingly parallel; shuffle and driver state stay the
    * model size) or a hierarchical coarse quantizer.
    */
  def trainCentroidsAtScale(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 10, samplePerCell: Int = 32): Array[Array[Float]] = {
    require(nlist > 0 && iters >= 0 && samplePerCell > 0,
      "nlist/samplePerCell must be positive, iters non-negative")
    // the id stays UNCAST (any orderable type — UUID strings included):
    // the driver trainer this transparently replaces at nlist ≥ 128
    // never required numeric ids, and a cast("long") here would null
    // every non-numeric id, collapsing the hash thinning and the pinned
    // init (self-review r15). xxhash64 and orderBy take any atomic type.
    val base = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<float>").as("v"))
    val n = base.count()
    val target = nlist.toLong * samplePerCell
    val den = 1000000L
    val num = if (n <= target) den else math.max(1L, den * target / n)
    val thinned =
      if (num >= den) base
      else base.filter(
        pmod(xxhash64(lit("ivf-coarse-sample"), col("id")), lit(den)) < lit(num))
    // L2-normalize on executors; zero vectors carry no direction and are
    // dropped from the TRAINING sample (assignment still routes them —
    // the kernel's dot against every centroid is 0, ties to cell 0)
    val sample = thinned
      .withColumn("nrm",
        sqrt(aggregate(col("v"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .filter(col("nrm") > 0.0d)
      .select(
        col("id"),
        transform(col("v"), x => (x.cast("double") / col("nrm")).cast("float"))
          .as("vf"),
        transform(col("v"),
          x => round(x.cast("double") / col("nrm") * lit(1e6), 0).cast("long"))
          .as("v6"))
      .localCheckpoint()
    try {
    val got = sample.count()
    require(got >= nlist, s"sample $got < nlist $nlist")

    // init: the nlist smallest-id sample vectors (pinned-init discipline)
    var centroids: Array[Array[Float]] = sample
      .orderBy(col("id")).limit(nlist)
      .select(col("vf")).collect()
      .map(_.getSeq[Float](0).toArray)
    val d = centroids.head.length

    // Per-dimension sums as d AGGREGATE COLUMNS under one hash-agg —
    // NOT a posexplode to (cell, dim) rows: the Generate stage inlines
    // its non-generator projections into the per-OUTPUT-row loop, so an
    // exploded update re-evaluated the O(nlist·d) nearest-cell kernel
    // once per dim — a d× blowup that dwarfed the work being distributed
    // (measured: the nlist=4096 update ran minutes per iteration; the
    // agg-columns shape runs the kernel once per sample row). The
    // shuffle also carries nlist rows of d sums instead of nlist·d rows.
    val aggCols = count(lit(1)).as("cnt") +:
      (0 until d).map(i => sum(element_at(col("v6"), i + 1)).as(s"s$i"))
    for (_ <- 1 to iters) {
      val rows = sample
        .select(
          element_at(
            VectorFunctions.nearestCells(col("vf"), centroids, 1), 1)
            .as("cell"),
          col("v6"))
        .groupBy(col("cell"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val byCell = rows.map(r => r.getInt(0) -> r).toMap
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        byCell.get(c).fold(old) { r =>
          val cnt = r.getLong(1)
          normalize(Array.tabulate(d)(i =>
            (r.getLong(2 + i).toDouble / cnt / 1e6).toFloat))
        }
      }
    }
    centroids
    // release the checkpointed sample: repeated builds in one session
    // (bench loops, multi-index DAGs) must not accumulate pinned blocks
    } finally sample.unpersist()
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    v.map(x => (x * inv).toFloat)
  }

  private def nearest(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestDot = Double.MinValue
    var c = 0
    while (c < centroids.length) {
      var dot = 0.0
      var i = 0
      val ctr = centroids(c)
      val n = math.min(v.length, ctr.length)
      while (i < n) { dot += v(i).toDouble * ctr(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** IVF top-k: returns (query_id, rank, neighbor_id), ranks on
    * round(cosine, 6) with id tie-break like [[Knn.bruteForceTopK]].
    */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 32, nprobe: Int = 8): DataFrame = {
    val centroids = trainCentroids(corpus, idCol, vecCol, nlist)
    val cells = (v: org.apache.spark.sql.Column, p: Int) =>
      VectorFunctions.nearestCells(v, centroids, p)

    val c = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      element_at(cells(col(vecCol), 1), 1).as("cell"))
    val probes = queries.select(
      col(idCol).as("qid"), explode(cells(col(vecCol), nprobe)).as("cell"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))

    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    c.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("id"),
        round(VectorFunctions.cosineSimilarity(col("v"), col("qv")), 6).as("score"))
      .groupBy("qid")
      .agg(topk(col("id"), col("score")).as("ids"))
      .select(col("qid").as("query_id"), posexplode(col("ids")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"), col("neighbor_id"))
  }
}
