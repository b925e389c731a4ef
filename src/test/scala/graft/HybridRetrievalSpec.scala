package graft

import graft.operators.HybridRetrieval

class HybridRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // doc 5 has text but NO vector: it can only surface via the lexical leg
  private val docs = Seq(
    (0L, "apple banana"), (1L, "apple banana"), (2L, "cherry durian"),
    (3L, "apple cherry"), (4L, "banana durian"), (5L, "apple banana extra"))
    .toDF("doc_id", "text")
  private val emb = Seq(
    (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f)),
    (3L, Array(-1f, 0f)), (4L, Array(0.5f, 0.5f)))
    .toDF("vec_id", "embedding")

  test("rrf fusion merges the dense and lexical rankings by rank alone") {
    val out = HybridRetrieval
      .rrfFuse(docs, emb, nQueries = 1, legK = 3, termCap = 2, fuseK = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq

    // dense leg for query 0: cosine ranks [1 (0.994), 4 (0.707), 2 (0.0)]
    // lexical leg (terms apple, banana): [1 (both, dl=2), 5 (both, dl=3),
    //   3 (apple; ties doc 4 on score, id tiebreak)]
    // rrf: doc1 = 2/61 = 0.032787; docs 4,5 = 1/62 = 0.016129 (id break);
    //   doc2 = doc3 = 1/63 = 0.015873 (id break) -> fuseK=4 keeps doc 2
    assert(out == Seq(
      (0L, 1, 1L, 0.032787),
      (0L, 2, 4L, 0.016129),
      (0L, 3, 5L, 0.016129),
      (0L, 4, 2L, 0.015873)))
    // the text-only doc surfaced through the lexical leg
    assert(out.map(_._3).contains(5L))
  }

  test("hard negatives = lexical top-k minus dense top-k, in BM25 order") {
    // query 0: dense top-3 = [1, 4, 2]; lexical top-3 = [1, 5, 3]
    // -> negatives [5, 3] (doc 5 is text-only: embedding-far by absence)
    val out = HybridRetrieval
      .hardNegatives(docs, emb, nQueries = 1, legK = 3, termCap = 2, k = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq((0L, 1, 5L), (0L, 2, 3L)))
    // BM25 order is preserved through the subtraction
    assert(out.head._4 >= out.last._4)
  }

  test("rrf plan: bounded top-k legs, broadcast term/stats tables") {
    val df = HybridRetrieval.rrfFuse(docs, emb, nQueries = 1, legK = 3, termCap = 2, fuseK = 4)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("partial_boundedtopk"),
      s"legs must reduce through the bounded aggregator:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"query terms must broadcast:\n$s")
  }

  test("indexed legs: fused ranking and hard negatives equal the in-query path; probe scan is pb-pruned") {
    // a corpus wide enough that several pb buckets exist and the query
    // vocab hits only SOME of them
    val wide = (docs.as[(Long, String)].collect().toSeq ++
      (10L until 40L).map(i => (i, s"filler$i term$i word$i")))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val dir = java.nio.file.Files.createTempDirectory("hybrid_idx").toString + "/idx"
    val index = graft.operators.Bm25.writeIndex(wide, dir, buckets = 16)

    val plainFuse = HybridRetrieval
      .rrfFuse(wide, emb, nQueries = 1, legK = 3, termCap = 2, fuseK = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val idxFuse = HybridRetrieval
      .rrfFuseIndexed(wide, emb, index, nQueries = 1, legK = 3, termCap = 2, fuseK = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(idxFuse == plainFuse,
      s"indexed fusion must equal in-query fusion:\n$idxFuse\n$plainFuse")

    val plainNeg = HybridRetrieval
      .hardNegatives(wide, emb, nQueries = 1, legK = 3, termCap = 2, k = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val idxNeg = HybridRetrieval
      .hardNegativesIndexed(wide, emb, index, nQueries = 1, legK = 3, termCap = 2, k = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(idxNeg == plainNeg)

    // ...and equality survives an exact append (the q82b grow contract)
    val extra = Seq((50L, "apple banana cherry word50")).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val grown = graft.operators.Bm25.appendToIndex(index, extra)
    val union = wide.unionByName(extra)
    val plainGrown = HybridRetrieval
      .rrfFuse(union, emb, nQueries = 1, legK = 3, termCap = 2, fuseK = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val idxGrown = HybridRetrieval
      .rrfFuseIndexed(union, emb, grown, nQueries = 1, legK = 3, termCap = 2, fuseK = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(idxGrown == plainGrown)

    // the probe's posting scan prunes to the query vocab's pb buckets:
    // partition filters carry pb IN (...) and the scan reads fewer
    // partitions than the index holds
    val probe = HybridRetrieval
      .rrfFuseIndexed(wide, emb, index, nQueries = 1, legK = 3, termCap = 2, fuseK = 4)
    probe.write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ => p.children.flatMap(walk)
    })
    val idxScans = walk(probe.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("hybrid_idx")) => f
    }
    assert(idxScans.nonEmpty, "the indexed path must scan the posting artifact")
    val allPbs = new java.io.File(dir).listFiles
      .count(_.getName.startsWith("pb="))
    idxScans.foreach { f =>
      assert(f.metadata("PartitionFilters").contains("pb"),
        s"pb pruning missing: ${f.metadata("PartitionFilters")}")
      assert(f.selectedPartitions.partitionCount < allPbs,
        s"probe must open fewer than all $allPbs buckets, opened ${f.selectedPartitions.partitionCount}")
    }
  }

  test("q85c ANN-dense fusion: full probing equals exact fusion; pruned probe clears the gate and is cell-pruned") {
    import org.apache.spark.sql.functions.lit
    import graft.operators.{Bm25, Pq}
    // every id has text AND a vector; 4 tight clusters in 8d — the PqSpec
    // regime where full-probe IVF-PQ + exact refine reproduces brute force
    val docs2 = (0L until 20L)
      .map(i => (i, s"apple banana word${i % 5} filler$i"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val emb2 = (0L until 20L).map { i =>
      val arr = Array.fill(8)(0.01f * (i % 3))
      arr((i % 4).toInt * 2) = 1f
      (i, arr)
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("hyb_ann").toString
    val bmIdx = Bm25.writeIndex(docs2, s"$root/bm25_idx", buckets = 16)
    val pqIdx = Pq.writeIndex(emb2, "vec_id", "embedding",
      Pq.train(emb2, "vec_id", "embedding", m = 4, k = 8),
      s"$root/hyb_dense_idx", nlist = 4)

    // full probing + refine >= corpus: the ANN fused list IS the exact
    // fused list (rank-only fusion — the q85 scaladoc's promise that
    // swapping the dense leg does not change the fusion)
    val (annFull, exactFull) = HybridRetrieval.annFusedLists(
      docs2, emb2, bmIdx, pqIdx, nQueries = 2, legK = 5, termCap = 2,
      fuseK = 5, nprobe = 4, refine = 20, k1 = 1.2, b = 0.75, rrfK = 60.0)
    assert(annFull.collect().map(_.toSeq).toSet
      == exactFull.collect().map(_.toSeq).toSet)

    // the registered gate shape at a PRUNED nprobe: recall_ok true, and
    // the dense probe's executed scan opened only the probed cells'
    // partitions (static pruning — the q107b discipline)
    val gate = HybridRetrieval.rrfFuseAnnGate(
      docs2, emb2, bmIdx, pqIdx, nQueries = 2, legK = 5, termCap = 2,
      fuseK = 5, nprobe = 1, refine = 20, floor = 0.2)
    val rows = gate.collect()
    assert(rows.length == 1 && rows.head.getAs[Boolean]("recall_ok"),
      s"gate must clear its floor: ${rows.mkString}")
    assert(rows.head.getAs[Long]("n_queries") == 2L)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ => p.children.flatMap(walk)
    })
    val denseScans = walk(gate.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("hyb_dense_idx")) => f
    }
    assert(denseScans.nonEmpty, "the gate must scan the dense index artifact")
    val allCells = new java.io.File(s"$root/hyb_dense_idx").listFiles
      .count(_.getName.startsWith("cell="))
    denseScans.foreach { f =>
      assert(f.metadata("PartitionFilters").contains("cell"),
        s"cell pruning missing: ${f.metadata("PartitionFilters")}")
      assert(f.selectedPartitions.partitionCount < allCells,
        s"probe must open fewer than all $allCells cells, opened ${f.selectedPartitions.partitionCount}")
    }
  }

  test("rrfFuseAnn: the production ANN-only probe equals the gate's ANN list; the exact dense scan is absent") {
    import org.apache.spark.sql.functions.lit
    import graft.operators.{Bm25, Pq}
    val root = java.nio.file.Files.createTempDirectory("hyb_ann_only").toString
    val docs2 = (0L until 20L)
      .map(i => (i, s"apple banana word${i % 5} filler$i"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    // PARQUET-backed embeddings so dense-side scans are observable plan
    // nodes (an in-memory frame would hide the exact leg's corpus scan)
    (0L until 20L).map { i =>
      val arr = Array.fill(8)(0.01f * (i % 3))
      arr((i % 4).toInt * 2) = 1f
      (i, arr)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$root/emb_store")
    val embP = spark.read.parquet(s"$root/emb_store")
    val bmIdx = Bm25.writeIndex(docs2, s"$root/bm25_idx", buckets = 16)
    val pqIdx = Pq.writeIndex(embP, "vec_id", "embedding",
      Pq.train(embP, "vec_id", "embedding", m = 4, k = 8),
      s"$root/hyb_dense_idx", nlist = 4)

    val annOnly = HybridRetrieval.rrfFuseAnn(
      docs2, embP, bmIdx, pqIdx, nQueries = 2, legK = 5, termCap = 2,
      fuseK = 5, nprobe = 1, refine = 20)
    val (annList, _) = HybridRetrieval.annFusedLists(
      docs2, embP, bmIdx, pqIdx, nQueries = 2, legK = 5, termCap = 2,
      fuseK = 5, nprobe = 1, refine = 20, k1 = 1.2, b = 0.75, rrfK = 60.0)
    val got = annOnly.orderBy("query_id", "rank")
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSeq
    val want = annList.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSeq
    assert(got.toSet == want.toSet && got.size == want.size,
      s"production probe must equal the gate's ANN list: got=$got want=$want")

    // plan assertions: the dense INDEX is scanned (cell-pruned), and the
    // exact dense leg is ABSENT — the gate's plan scans the embedding
    // store strictly more often (its exact leg's full-corpus scan)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ => p.children.flatMap(walk)
    })
    def scansOf(df: org.apache.spark.sql.DataFrame, tag: String) =
      walk(df.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(tag)) => f
      }
    annOnly.write.format("noop").mode("overwrite").save()
    val gate = HybridRetrieval.rrfFuseAnnGate(
      docs2, embP, bmIdx, pqIdx, nQueries = 2, legK = 5, termCap = 2,
      fuseK = 5, nprobe = 1, refine = 20, floor = 0.2)
    gate.collect()
    val idxScans = scansOf(annOnly, "hyb_dense_idx")
    assert(idxScans.nonEmpty, "the probe must scan the dense index")
    val allCells = new java.io.File(s"$root/hyb_dense_idx").listFiles
      .count(_.getName.startsWith("cell="))
    idxScans.foreach(f => assert(f.selectedPartitions.partitionCount < allCells))
    val annEmbScans = scansOf(annOnly, "emb_store").size
    val gateEmbScans = scansOf(gate, "emb_store").size
    assert(annEmbScans < gateEmbScans,
      s"the exact dense leg's corpus scan must be absent from the " +
        s"production probe's plan: ann=$annEmbScans gate=$gateEmbScans")
  }

  test("query vocab over the isin threshold: the semi-join fallback ranks identically to the in-query path") {
    import graft.operators.Bm25
    // 6 query docs × ~100 distinct terms each pushes the query vocab past
    // VocabIsinThreshold — the probe's term pruning must switch from plan
    // literals to a broadcast semi-join WITHOUT changing a single rank.
    // Terms are pair-shared (u<g>_<j> appears in docs g and g+20) so the
    // idf cap retains cross-doc matches and the ranking is non-trivial.
    val bigDocs = (0L until 40L).map { i =>
      val grouped = (0 until 100).map(j => s"u${i % 20}_$j").mkString(" ")
      (i, s"shared${i % 7} $grouped")
    }.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val bigEmb = (0L until 40L).map { id =>
      val raw = (0 until 8).map(j => math.sin(id * 31 + j + 1))
      val n = math.sqrt(raw.map(x => x * x).sum)
      (id, raw.map(x => (x / n).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val vocabN = bigDocs.filter($"doc_id" < 6)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("t"))
      .distinct().count()
    assert(vocabN > HybridRetrieval.VocabIsinThreshold,
      s"fixture must force the fallback: vocab=$vocabN <= ${HybridRetrieval.VocabIsinThreshold}")

    val root = java.nio.file.Files.createTempDirectory("hyb_fallback").toString
    val bmIdx = Bm25.writeIndex(bigDocs, s"$root/bm25_idx", buckets = 16)
    val indexed = HybridRetrieval.rrfFuseIndexed(
      bigDocs, bigEmb, bmIdx, nQueries = 6, legK = 5, termCap = 4, fuseK = 5)
    val inQuery = HybridRetrieval.rrfFuse(
      bigDocs, bigEmb, nQueries = 6, legK = 5, termCap = 4, fuseK = 5)
    val a = indexed.as[(Long, Int, Long, Double)].collect().toSet
    val b = inQuery.as[(Long, Int, Long, Double)].collect().toSet
    assert(a == b, s"fallback path must rank identically: only-indexed=" +
      s"${(a -- b).take(3)} only-inquery=${(b -- a).take(3)}")
    // the fallback really engaged: the df pass restricts terms via a
    // LEFT SEMI broadcast join, not a 600-literal isin list
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      "expected the broadcast semi-join term restriction in the plan")
  }
}
