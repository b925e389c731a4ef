package graft

import graft.operators.{Knn, Pq}
import org.apache.spark.sql.functions._

class PqSpec extends SparkTestBase {
  import spark.implicits._

  // 5 tight clusters of near-identical 16-dim directions, 8 members each —
  // the regime PQ codes preserve (subspace centroids land on the clusters)
  private lazy val clustered = {
    val rows = for (c <- 0 until 5; i <- 0 until 8) yield {
      val base = (0 until 16).map(j => math.sin(c * 37 + j + 1))
      val jit = base.zipWithIndex.map { case (v, j) =>
        (v + 0.005 * math.cos(i * 13 + j)).toFloat }
      val norm = math.sqrt(jit.map(x => x.toDouble * x).sum)
      (c * 10L + i, jit.map(x => (x / norm).toFloat).toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("model shape: m codebooks of k grid centroids of d/m dims") {
    val model = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    assert(model.m == 4 && model.k == 8 && model.subDim == 4)
  }

  test("codes are in range and identical vectors encode identically") {
    val model = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val withDup = clustered.unionByName(
      clustered.filter($"vec_id" === 0L).select(lit(999L).as("vec_id"), $"embedding"))
    val codes = Pq.encode(withDup, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(cs => cs.size == 4 && cs.forall(c => c >= 0 && c < 8)))
    assert(codes(999L) == codes(0L))
  }

  test("clustered corpus: PQ+refine recall@5 is 1.0 vs brute force") {
    val model = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 8, iters = 3)
    val q = clustered.filter($"vec_id" < 3)
    val pq = Pq.topK(clustered, q, "vec_id", "embedding", 5, model, refine = 10)
      .as[(Long, Int, Long)].collect().toSet
    val brute = Knn.bruteForceTopK(clustered, q, "vec_id", "embedding", 5)
      .as[(Long, Int, Long)].collect().toSet
    assert(pq.map(t => (t._1, t._3)) == brute.map(t => (t._1, t._3)),
      s"pq=$pq brute=$brute")
  }

  test("clustered corpus: IVF-PQ with full probing equals brute force") {
    val model = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 8, iters = 3)
    val q = clustered.filter($"vec_id" < 3)
    // nprobe == nlist: no cell can be missed, so recall is pure PQ+refine
    val ivfpq = Pq.ivfTopK(clustered, q, "vec_id", "embedding", 5, model,
      nlist = 4, nprobe = 4, refine = 10)
      .as[(Long, Int, Long)].collect().toSet
    val brute = Knn.bruteForceTopK(clustered, q, "vec_id", "embedding", 5)
      .as[(Long, Int, Long)].collect().toSet
    assert(ivfpq.map(t => (t._1, t._3)) == brute.map(t => (t._1, t._3)),
      s"ivfpq=$ivfpq brute=$brute")
    // cell pruning really prunes: nprobe=1 on clustered data still finds
    // same-cluster neighbors (clusters align with cells)
    val pruned = Pq.ivfTopK(clustered, q, "vec_id", "embedding", 5, model,
      nlist = 4, nprobe = 1, refine = 10)
      .as[(Long, Int, Long)].collect()
    assert(pruned.nonEmpty)
  }

  test("refine floor: shortlist below k is rejected") {
    val model = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 8, iters = 1)
    val ex = intercept[IllegalArgumentException] {
      Pq.topK(clustered, clustered.limit(1), "vec_id", "embedding", 5, model, refine = 3)
    }
    assert(ex.getMessage.contains("refine"))
  }

  test("persisted index: probe scan reads ONLY the probed cells' partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/idx"
    val model = Pq.train(clustered, "vec_id", "embedding", m = 4, k = 8, iters = 3)
    val written = Pq.writeIndex(clustered, "vec_id", "embedding", model, dir, nlist = 4)

    // the artifact is self-contained: a re-read reproduces model + centroids
    val idx = Pq.readIndex(spark, dir)
    assert(idx.centroids.map(_.toSeq).toSeq == written.centroids.map(_.toSeq).toSeq)
    assert(idx.model.books.map(_.map(_.toSeq).toSeq).toSeq ==
      written.model.books.map(_.map(_.toSeq).toSeq).toSeq)

    val q = clustered.filter($"vec_id" < 3)
    val res = Pq.ivfTopKIndexed(idx, clustered, q, "vec_id", "embedding", 5,
      nprobe = 1, refine = 10)
    val rows = res.collect()
    assert(rows.nonEmpty)

    // results identical to the in-query path (same model, same centroids)
    val inQuery = Pq.ivfTopK(clustered, q, "vec_id", "embedding", 5, model,
      nlist = 4, nprobe = 1, refine = 10).collect()
    assert(rows.map(_.toSeq).toSet == inQuery.map(_.toSeq).toSet)

    // the §5 claim as CI: the executed index scan opened only the probed
    // cells' files — static partition pruning, not a full-table read
    // after execution AQE leaves are QueryStageExec nodes wrapping the
    // materialized stages — recurse through them to reach the file scans
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
      }.flatten
    val idxScan = scans(res.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("ivfpq")))
      .getOrElse(fail("no index scan in plan"))
    val totalFiles = spark.read.parquet(dir).inputFiles.length
    val readFiles = idxScan.metrics("numFiles").value
    assert(readFiles < totalFiles,
      s"pruned scan read $readFiles of $totalFiles files")
    // 3 queries in the same cluster at nprobe=1 probe <= 3 distinct cells
    assert(idxScan.toString.contains("PartitionFilters"), idxScan.toString)
  }

  test("writeIndexOnce: second call serves the cached artifact without touching a byte") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_once").toString + "/idx"
    def allFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).map(f => (f.getPath, f.lastModified, f.length))
        .sortBy(_._1)
    }
    val first = Pq.writeIndexOnce(clustered, "vec_id", "embedding",
      Pq.train(clustered, "vec_id", "embedding", m = 4, k = 8, iters = 3),
      dir, nlist = 4)
    val snapshot = allFiles

    // same (session, path): the cached handle comes back, the train is
    // never evaluated (a poisoned by-name model proves it), and no file
    // is rewritten — the amortization q107b's bench loop relies on
    val second = Pq.writeIndexOnce(clustered, "vec_id", "embedding",
      fail("cache hit must not re-train"): Pq.PqModel, dir, nlist = 4)
    assert(second eq first)
    assert(allFiles == snapshot)

    // probes through the cached artifact equal a fresh rehydrate
    val q = clustered.filter($"vec_id" < 3)
    val viaCache = Pq.ivfTopKIndexed(second, clustered, q, "vec_id", "embedding",
      5, nprobe = 4, refine = 10).collect().map(_.toSeq).toSet
    val viaRead = Pq.ivfTopKIndexed(Pq.readIndex(spark, dir), clustered, q,
      "vec_id", "embedding", 5, nprobe = 4, refine = 10)
      .collect().map(_.toSeq).toSet
    assert(viaCache == viaRead)
  }

  test("incremental append: frozen-model equality with a one-shot union build; untouched cells byte-identical") {
    val base = clustered.filter($"vec_id" % 10 < 6)
    val delta = clustered.filter($"vec_id" % 10 >= 6)
    val model = Pq.train(base, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("pq_inc").toString

    val idx = Pq.writeIndex(base, "vec_id", "embedding", model, s"$dir/idx", nlist = 4)

    // snapshot every data file (path, length, mtime) per cell before append
    def files(): Map[String, Set[(String, Long, Long)]] = {
      val root = new java.io.File(s"$dir/idx")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length(), f.lastModified())).toSet)
        .toMap
    }
    val before = files()

    val added = Pq.appendToIndex(idx, delta, "vec_id", "embedding")
      .as[(Int, Long)].collect().toMap
    assert(added.values.sum == delta.count())

    // cells that received no delta rows: EXACT file identity (names,
    // sizes, mtimes); cells that grew: the old files survive untouched
    val after = files()
    for ((cell, fs) <- before) {
      val cellId = cell.stripPrefix("cell=").toInt
      if (added.getOrElse(cellId, 0L) == 0L)
        assert(after(cell) == fs, s"untouched $cell was rewritten")
      else
        assert(fs.subsetOf(after(cell)), s"$cell lost or rewrote a pre-append file")
    }

    // content equality with a one-shot build of the UNION under the SAME
    // frozen model + centroids (the rebuild a naive pipeline would pay)
    val grown = spark.read.parquet(s"$dir/idx")
      .select("id", "cell", "codes").as[(Long, Int, Seq[Int])].collect().toSet
    val oneShot = Pq.indexRows(clustered, "vec_id", "embedding",
      model, idx.centroids).as[(Long, Int, Seq[Int])].collect().toSet
    assert(grown == oneShot)

    // probes over the grown index == probes over a one-shot-written union
    // index with the same model/centroids (bit-identical all-long tail)
    Pq.indexRows(clustered, "vec_id", "embedding", model, idx.centroids)
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/union")
    val unionIdx = Pq.IvfPqIndex(s"$dir/union", idx.centroids, model)
    val q = clustered.filter($"vec_id" < 3)
    def probe(i: Pq.IvfPqIndex) =
      Pq.ivfTopKIndexed(i, clustered, q, "vec_id", "embedding", 5,
        nprobe = 4, refine = 20)
        .as[(Long, Int, Long)].collect().toSet
    assert(probe(idx) == probe(unionIdx))

    // occupancy drift: growth reflects the append; a tight skew threshold
    // combined with real growth below maxGrowth stays green, while a
    // maxGrowth below the actual growth trips the gate
    val drift = Pq.occupancyDrift(spark, s"$dir/idx").collect().head
    assert(drift.getAs[Long]("n_now") == clustered.count())
    assert(drift.getAs[Double]("growth") > 1.0)
    val tripped = Pq.occupancyDrift(spark, s"$dir/idx",
      maxGrowth = drift.getAs[Double]("growth") - 0.01).collect().head
    assert(tripped.getAs[Boolean]("retrain_due"))
  }

  test("appendBatch crash protocol: day-one replay rebuilds (never duplicates); a claimed-but-dead append reads red") {
    val day1 = clustered.filter($"vec_id" % 10 < 6)
    val day2 = clustered.filter($"vec_id" % 10 >= 6)
    val dir = java.nio.file.Files.createTempDirectory("pq_crash").toString + "/idx"

    // normal day one: build + marker with content -> gate green
    val n1 = Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8)
    assert(n1 == day1.count())
    assert(Pq.appendBatchApplied(spark, dir, 1L))
    assert(!Pq.appendBatchApplied(spark, dir, 2L))

    // simulate a day-one crash BETWEEN writeIndex and the marker: delete
    // the marker (index files remain). The replay must take the BUILD
    // branch (idempotent overwrite) — the old decision keyed on
    // _centroids existing and would have detoured into append,
    // duplicating every day-one vector
    val m1 = new java.io.File(s"$dir/_batches/day-1")
    assert(m1.delete())
    val n1b = Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8)
    assert(n1b == day1.count())
    val afterReplay = spark.read.parquet(dir)
      .select("id").as[Long].collect()
    assert(afterReplay.length == afterReplay.distinct.length,
      "day-one replay duplicated vectors")
    assert(afterReplay.toSet == day1.select($"vec_id".cast("long"))
      .as[Long].collect().toSet)

    // normal day two appends and reads applied
    val n2 = Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 4, k = 8)
    assert(n2 == day2.count() && Pq.appendBatchApplied(spark, dir, 2L))

    // simulate a crashed day-three append: an EMPTY claim marker. The
    // replay is a no-op (-1, missing-not-duplicated) and the gate reads
    // RED — bare exists() would have reported it green forever
    val m3 = new java.io.File(s"$dir/_batches/day-3")
    m3.getParentFile.mkdirs()
    assert(m3.createNewFile())
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 3L, nlist = 4, k = 8) == -1L)
    assert(!Pq.appendBatchApplied(spark, dir, 3L))
    // the documented repair: delete the claim, replay applies
    assert(m3.delete())
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 3L, nlist = 4, k = 8) == day2.count())
    assert(Pq.appendBatchApplied(spark, dir, 3L))
  }

  test("claimed-but-dead append SELF-HEALS when the manifest proves nothing landed; red only when data DID land") {
    val day1 = clustered.filter($"vec_id" % 10 < 6)
    val day2 = clustered.filter($"vec_id" % 10 >= 6)
    val dir = java.nio.file.Files.createTempDirectory("pq_heal").toString + "/idx"
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == day1.count())

    // simulate a crash right AFTER the claim (the common case: the Spark
    // write never committed) — exactly the on-disk state the real claim
    // leaves: a .pre manifest of the current data files + an empty marker
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def put(name: String, content: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/_batches/$name")
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      out.write(content.getBytes("UTF-8"))
      out.close()
    }
    put("2.pre", Pq.dataFileManifest(fs, dir))
    put("2", "")
    assert(!Pq.appendBatchApplied(spark, dir, 2L))
    // the retry (a Dag.Task retry calls appendBatch again) self-heals:
    // the r10 behavior was -1 + red-forever until a manual marker delete
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 4, k = 8) == day2.count())
    assert(Pq.appendBatchApplied(spark, dir, 2L))
    val ids = spark.read.parquet(dir).select("id").as[Long].collect()
    assert(ids.length == ids.distinct.length, "self-heal duplicated vectors")
    assert(ids.toSet == clustered.select($"vec_id".cast("long")).as[Long].collect().toSet)

    // the narrow commit-vs-marker window: the manifest recorded at claim
    // time does NOT match the files on disk (the append landed, the
    // marker rewrite died) — must stay red for the operator, NOT re-append
    put("3.pre", "stale-manifest-from-before-the-commit")
    put("3", "")
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 3L, nlist = 4, k = 8) == -1L)
    assert(!Pq.appendBatchApplied(spark, dir, 3L))
    // a legacy/hand-made empty claim with NO manifest: no proof, stays red
    val m3 = new java.io.File(s"$dir/_batches/3")
    val p3 = new java.io.File(s"$dir/_batches/3.pre")
    assert(p3.delete())
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 3L, nlist = 4, k = 8) == -1L)
    assert(m3.delete()) // the documented manual repair still works
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 3L, nlist = 4, k = 8) == day2.count())
  }

  test("a dead claim survives an INTERVENING rebuild or compaction: adjudicated at lease entry while the manifest proof holds, so the batch's retry re-applies (crash-fuzz r18)") {
    // the crash-fuzz seed-7 loss: producer SIGKILLed right after its
    // claim (nothing landed), but the NEXT mutation through the lease is
    // a REBUILD whose wholesale rewrite invalidates the .pre manifest —
    // pre-fix, the batch's own retry then read permanently red (-1) and
    // its empty claim rode the marker snapshot through the swap: a
    // silent one-batch loss wearing a claimed marker
    val day1 = clustered.filter($"vec_id" % 10 < 6)
    val day2 = clustered.filter($"vec_id" % 10 >= 6 && $"vec_id" % 10 < 8)
    val day3 = clustered.filter($"vec_id" % 10 >= 8)
    val dir = java.nio.file.Files.createTempDirectory("pq_deadclaim").toString + "/idx"
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == day1.count())
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def put(name: String, content: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/_batches/$name")
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      out.write(content.getBytes("UTF-8"))
      out.close()
    }
    // the crashed claim: .pre manifest of the CURRENT files + empty marker
    put("day-2.pre", Pq.dataFileManifest(fs, dir))
    put("day-2", "")

    // an intervening drift REBUILD (gate consulted, fires or not — the
    // adjudication runs at lease entry either way) must heal the dead
    // claim instead of baking its empty marker into the swap
    Pq.rebuildIfDrifted(spark, dir,
      spark.read.parquet(dir).select(col("id").as("vec_id"))
        .join(clustered, Seq("vec_id")).select($"vec_id", $"embedding"),
      "vec_id", "embedding", nlist = 4, k = 8,
      maxSkewGrowth = 1.0, maxGrowth = 1.0) // aggressive: genuinely fires
    assert(!new java.io.File(s"$dir/_batches/day-2").exists(),
      "the rebuild carried a dead claim through its marker snapshot")
    assert(!new java.io.File(s"$dir/_batches/day-2.pre").exists())
    // the retry now applies as fresh — pre-fix it returned -1 forever
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 4, k = 8) == day2.count())
    assert(Pq.appendBatchApplied(spark, dir, 2L))

    // same class through COMPACTION's rewrite
    put("day-3.pre", Pq.dataFileManifest(fs, dir))
    put("day-3", "")
    graft.sources.Compaction.compact(spark, dir, "cell",
      maxFiles = 1, smallFileBytes = Long.MaxValue / 4)
    assert(!new java.io.File(s"$dir/_batches/day-3").exists(),
      "compaction destroyed the dead claim's proof without adjudicating it")
    assert(Pq.appendBatch(spark, day3, "vec_id", "embedding", dir,
      batchId = 3L, nlist = 4, k = 8) == day3.count())

    // and the red case stays red through a rebuild: a claim whose proof
    // FAILS (data may have landed) is never silently deleted
    put("day-4.pre", "stale-manifest-from-before-the-commit")
    put("day-4", "")
    Pq.rebuildIfDrifted(spark, dir,
      spark.read.parquet(dir).select(col("id").as("vec_id"))
        .join(clustered, Seq("vec_id")).select($"vec_id", $"embedding"),
      "vec_id", "embedding", nlist = 4, k = 8,
      maxSkewGrowth = 1.0, maxGrowth = 1.0)
    assert(new java.io.File(s"$dir/_batches/day-4").exists(),
      "a proof-failing claim must stay red for the operator, not vanish")
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 4L, nlist = 4, k = 8) == -1L)

    // the healthy content is intact throughout
    val ids = spark.read.parquet(dir).select("id").as[Long].collect()
    assert(ids.length == ids.distinct.length)
    assert(ids.toSet == clustered.select($"vec_id".cast("long")).as[Long].collect().toSet)
  }

  test("legacy bare markers: a pre-migration applied day replays as a no-op; new claims are day-namespaced") {
    val day1 = clustered.filter($"vec_id" % 10 < 6)
    val day2 = clustered.filter($"vec_id" % 10 >= 6)
    val dir = java.nio.file.Files.createTempDirectory("pq_legacy").toString + "/idx"
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == day1.count())
    // simulate a pre-upgrade index: the applied marker under the OLD bare
    // spelling (rename, preserving its row-count content)
    assert(new java.io.File(s"$dir/_batches/day-1")
      .renameTo(new java.io.File(s"$dir/_batches/1")))
    assert(Pq.appendBatchApplied(spark, dir, 1L))
    // the replay no-ops through the bare marker — the index is never
    // rebuilt from a single day or double-appended
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == -1L)
    val ids = spark.read.parquet(dir).select("id").as[Long].collect()
    assert(ids.length == ids.distinct.length)
    // fresh batches claim namespaced only
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 4, k = 8) == day2.count())
    assert(new java.io.File(s"$dir/_batches/day-2").exists())
    assert(!new java.io.File(s"$dir/_batches/2").exists())
    // a bare marker for a FUTURE ingest day (legacy stream counter range)
    // does not shadow that day
    val future = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toEpochDay + 40
    val out = new java.io.FileOutputStream(s"$dir/_batches/$future")
    out.write("99".getBytes("UTF-8")); out.close()
    assert(!Pq.appendBatchApplied(spark, dir, future))
  }

  test("rebuildIfDrifted: a no-drift day leaves every byte alone; drift rebuilds to fresh-build probes with replay markers intact") {
    val day1 = clustered.filter($"vec_id" % 10 < 6)
    val day2 = clustered.filter($"vec_id" % 10 >= 6)
    val dir = java.nio.file.Files.createTempDirectory("pq_rebuild").toString + "/idx"
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == day1.count())
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 4, k = 8) == day2.count())

    def snapshot(): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .map(f => (f.getPath, f.length(), f.lastModified())).toSet
    }

    // generous thresholds: gate green -> NOTHING is touched (names,
    // lengths, mtimes all identical across the whole artifact)
    val before = snapshot()
    assert(!Pq.rebuildIfDrifted(spark, dir, clustered, "vec_id", "embedding",
      nlist = 4, m = 8, k = 8, maxSkewGrowth = 100.0, maxGrowth = 100.0))
    assert(snapshot() == before, "a no-drift rebuild check modified the artifact")

    // force the gate (growth since build ~1.67 > 1.01) -> full rebuild
    assert(Pq.rebuildIfDrifted(spark, dir, clustered, "vec_id", "embedding",
      nlist = 4, m = 8, k = 8, maxGrowth = 1.01))

    // post-rebuild probes == a FRESH build of the union corpus (same
    // train/write path, so model + centroids + codes all agree)
    val freshDir = java.nio.file.Files.createTempDirectory("pq_fresh").toString + "/idx"
    val fresh = Pq.writeIndex(clustered, "vec_id", "embedding",
      Pq.train(clustered, "vec_id", "embedding", m = 8, k = 8), freshDir, nlist = 4)
    val rebuilt = Pq.readIndex(spark, dir)
    val q = clustered.filter($"vec_id" < 3)
    def probe(i: Pq.IvfPqIndex) =
      Pq.ivfTopKIndexed(i, clustered, q, "vec_id", "embedding", 5,
        nprobe = 4, refine = 20).as[(Long, Int, Long)].collect().toSet
    assert(probe(rebuilt) == probe(fresh))

    // the rebuilt reference re-arms the gate at the new distribution...
    val drift = Pq.occupancyDrift(spark, dir).collect().head
    assert(drift.getAs[Double]("growth") == 1.0 && !drift.getAs[Boolean]("retrain_due"))
    // ...and the replay markers survived the overwrite: both applied days
    // still no-op instead of re-appending into the rebuilt index
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == -1L)
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 4, k = 8) == -1L)
    assert(Pq.appendBatchApplied(spark, dir, 1L) && Pq.appendBatchApplied(spark, dir, 2L))

    // --- crash-window recovery (r11 ADVICE): the rebuild is staged +
    // rename-swapped, so interrupting it can never leave a marker-less
    // index for appendBatch to silently rebuild from one day.
    val stagedDir = new java.io.File(s"$dir.rebuild.staged")
    def copyTree(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs(); src.listFiles().foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    def deleteTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteTree); f.delete()
    }
    // window A: crash BEFORE the stage was sealed (no _swap_ready) — a
    // non-writer entry point (appendBatch) must leave the stage alone
    // (r12 ADVICE: a reader-side delete races a concurrent rebuild
    // mid-write) and the live index untouched; the WRITER's own heal
    // (rebuildIfDrifted entry, even on a no-drift day) discards it
    copyTree(new java.io.File(dir), stagedDir)
    val liveBefore = snapshot()
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == -1L) // entry point heals + replays
    assert(stagedDir.exists(),
      "a non-writer entry must leave the unsealed stage for the writer")
    assert(snapshot() == liveBefore, "healing an unsealed stage touched the live index")
    assert(!Pq.rebuildIfDrifted(spark, dir, clustered, "vec_id", "embedding",
      nlist = 4, m = 8, k = 8, maxSkewGrowth = 100.0, maxGrowth = 100.0))
    assert(!stagedDir.exists(), "the writer pass must discard the stale stage")
    assert(snapshot() == liveBefore, "the no-drift writer pass touched the live index")
    // window B: crash BETWEEN the index delete and the rename — sealed
    // stage present, live index ABSENT. Heal must finish the swap; the
    // markers ride inside the stage, so the replayed days still no-op
    // (the pre-fix failure mode: appendBatch saw no markers and rebuilt
    // the index from day1 alone)
    copyTree(new java.io.File(dir), stagedDir)
    new java.io.File(stagedDir, "_swap_ready").createNewFile()
    deleteTree(new java.io.File(dir))
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == -1L)
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 4, k = 8) == -1L)
    assert(!stagedDir.exists() && !new java.io.File(dir, "_swap_ready").exists())
    // the healed index still probes like the fresh union build
    assert(probe(Pq.readIndex(spark, dir)) == probe(fresh))
  }

  test("ANN artifact compaction: 10 appends' small files fold to a bounded count, probes and sidecars untouched") {
    // a wider corpus than `clustered` so every append touches most cells:
    // 200 unit vectors in the same 5-direction regime
    val wide = {
      val rows = (0L until 200L).map { id =>
        val base = (0 until 16).map(j => math.sin((id % 5) * 37 + j + 1))
        val jit = base.zipWithIndex.map { case (v, j) =>
          (v + 0.004 * math.cos(id * 13 + j)).toFloat }
        val n = math.sqrt(jit.map(x => x.toDouble * x).sum)
        (id, jit.map(x => (x / n).toFloat).toArray)
      }
      rows.toDF("vec_id", "embedding")
    }
    val dir = java.nio.file.Files.createTempDirectory("pq_compact").toString + "/idx"
    assert(Pq.appendBatch(spark, wide.filter($"vec_id" < 100), "vec_id", "embedding",
      dir, batchId = 1L, nlist = 4, k = 8) == 100L)
    for (b <- 0 until 10)
      assert(Pq.appendBatch(spark,
        wide.filter($"vec_id" >= 100 + b * 10 && $"vec_id" < 110 + b * 10),
        "vec_id", "embedding", dir, batchId = 2L + b, nlist = 4, k = 8) == 10L)

    val before = graft.sources.Compaction.stats(spark, dir, "cell")
    assert(before.exists(_.nFiles > 4),
      s"appends should have accumulated small files: $before")
    val idx = Pq.readIndex(spark, dir)
    val q = wide.filter($"vec_id" < 3)
    def probe() = Pq.ivfTopKIndexed(idx, wide, q, "vec_id", "embedding", 5,
      nprobe = 4, refine = 20).as[(Long, Int, Long)].collect().toSet
    val probesBefore = probe()
    val content = spark.read.parquet(dir)
      .select("id", "cell", "codes").as[(Long, Int, Seq[Int])].collect().toSet
    def sidecars(): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.startsWith("_")).flatMap(walk)
        .map(f => (f.getPath, f.length(), f.lastModified())).toSet
    }
    val sidecarsBefore = sidecars()

    // the maintenance pass VERDICT r10 #8 asks for: point Compaction at
    // the cell partitions; every over-threshold cell folds to its
    // byte-targeted file count (tiny cells -> 1 file)
    val rewritten = graft.sources.Compaction.compact(spark, dir, "cell", maxFiles = 4)
    assert(rewritten.nonEmpty)
    val after = graft.sources.Compaction.stats(spark, dir, "cell")
    assert(after.forall(_.nFiles <= 4),
      s"compaction left an over-threshold cell: $after")
    assert(spark.read.parquet(dir)
      .select("id", "cell", "codes").as[(Long, Int, Seq[Int])].collect().toSet == content)
    assert(probe() == probesBefore)
    assert(sidecars() == sidecarsBefore,
      "compaction must never touch the model/marker sidecars")
    // idempotent: a compacted artifact is a no-op for the next run
    assert(graft.sources.Compaction.compact(spark, dir, "cell", maxFiles = 4).isEmpty)
  }

  test("layout stamp: an append under different (nlist, m, k) fails loudly; a rebuild legitimately re-stamps") {
    val day1 = clustered.filter($"vec_id" % 10 < 6)
    val day2 = clustered.filter($"vec_id" % 10 >= 6)
    val dir = java.nio.file.Files.createTempDirectory("pq_conf").toString + "/idx"
    assert(Pq.appendBatch(spark, day1, "vec_id", "embedding", dir,
      batchId = 1L, nlist = 4, k = 8) == day1.count())
    // pre-stamp, a mismatched append was SILENTLY served the frozen
    // day-one model; now the drifted caller learns it instead
    val err = intercept[IllegalStateException] {
      Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
        batchId = 2L, nlist = 8, k = 8)
    }
    assert(err.getMessage.contains("nlist: index=4 caller=8"))
    assert(!Pq.appendBatchApplied(spark, dir, 2L),
      "the refused batch must not have claimed its marker")
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 4, k = 8) == day2.count())

    // a rebuild retrains and rewrites every code — changing the layout
    // there is legal, and the stamp follows the swap
    assert(Pq.rebuildIfDrifted(spark, dir, clustered, "vec_id", "embedding",
      nlist = 8, m = 8, k = 8, maxGrowth = 1.01))
    assert(graft.sources.IndexConf.read(spark, dir)
      .exists(_("nlist") == "8"))
    // appends now coordinate on the NEW layout: old request refused,
    // new request replays/applies normally
    intercept[IllegalStateException] {
      Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
        batchId = 3L, nlist = 4, k = 8)
    }
    assert(Pq.appendBatch(spark, day2, "vec_id", "embedding", dir,
      batchId = 2L, nlist = 8, k = 8) == -1L)
  }

  test("determinism: same model and ranks under different partitioning") {
    val a = Pq.train(clustered.repartition(7), "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val b = Pq.train(clustered.repartition(2), "vec_id", "embedding", m = 4, k = 8, iters = 2)
    assert(a.books.map(_.map(_.toSeq).toSeq).toSeq == b.books.map(_.map(_.toSeq).toSeq).toSeq)
  }
}
