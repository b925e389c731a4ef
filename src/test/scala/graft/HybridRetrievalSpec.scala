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
}
