package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  // path graph 1—2—3, bidirected
  private def pathEdges =
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")

  test("hand-traced 2-iteration fixpoint on the path graph (all-LONG)") {
    // N=3, pr0 = 333333333333 each, base = 15e12 // 300 = 50000000000.
    // it1: end nodes get (pr0//2)=166666666666 -> 5e10+85*...//100
    //      = 191666666666; middle gets 2*pr0 -> 616666666666.
    // it2: ends get (616666666666//2)=308333333333 -> 312083333333;
    //      middle gets 2*191666666666 -> 375833333332.
    val out = Graph.pageRank(pathEdges, "src", "dst", iters = 2)
      .select("node", "pr_e12").as[(Long, Long)].collect().toMap
    assert(out == Map(
      1L -> 312083333333L, 2L -> 375833333332L, 3L -> 312083333333L))
  }

  test("symmetric graph -> equal ranks; mass conserved up to div floors") {
    // triangle, bidirected: fully symmetric
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val prs = Graph.pageRank(tri, "src", "dst", iters = 5)
      .select("pr_e12").as[Long].collect().toSeq
    assert(prs.distinct.size == 1)
    val total = prs.sum
    assert(total <= Graph.Scale && total > Graph.Scale - 1000L)
  }

  test("partitioning independence: same longs under different layouts") {
    val a = Graph.pageRank(pathEdges.repartition(7), "src", "dst", iters = 3)
      .select("node", "pr_e12").as[(Long, Long)].collect().toSet
    val b = Graph.pageRank(pathEdges.repartition(2, col("dst")), "src", "dst", iters = 3)
      .select("node", "pr_e12").as[(Long, Long)].collect().toSet
    assert(a == b && a.size == 3)
  }

  test("sink nodes are rejected, not silently leaked") {
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 3 is a sink
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(directed, "src", "dst")
    }
    assert(ex.getMessage.contains("sink"))
  }

  test("bucketed edges: identical ranks, zero Exchange above the edge scan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

    // larger bidirected ring + chords so the join is non-trivial
    val ring = (0L until 40L).flatMap { i =>
      val j = (i + 1) % 40
      val c = (i + 7) % 40
      Seq((i, j), (j, i), (i, c), (c, i))
    }.toDF("src", "dst")

    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // tiny sides would broadcast and trivially skip the Exchange; force
      // the planner to choose shuffle vs bucket co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = Graph.pageRankBucketed(spark, ring, "src", "dst",
        table = "graft_pr_edges_spec", buckets = 4, iters = 3)

      // the segment between the consuming join and the bucketed edge scan
      // must be Exchange-free (downstream aggregation shuffles are fine —
      // they move rank rows, not edges)
      def path(p: SparkPlan): Option[List[SparkPlan]] = p match {
        case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => Some(List(s))
        case a: AdaptiveSparkPlanExec => path(a.executedPlan).map(a :: _)
        case o => o.children.iterator.map(path)
          .collectFirst { case Some(l) => o :: l }
      }
      val pth = path(bucketed.queryExecution.executedPlan)
      assert(pth.isDefined, "expected the bucketed edge scan in the final iteration plan")
      val scanUpToJoin = pth.get.reverse
        .takeWhile(!_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(scanUpToJoin.nonEmpty && scanUpToJoin.size < pth.get.size,
        s"expected a join consuming the edge scan:\n${bucketed.queryExecution.executedPlan}")
      assert(scanUpToJoin.forall(!_.isInstanceOf[ShuffleExchangeExec]),
        s"Exchange between the edge scan and its join:\n${bucketed.queryExecution.executedPlan}")

      val plain = Graph.pageRank(ring, "src", "dst", iters = 3)
        .select("node", "pr_e12").as[(Long, Long)].collect().toSet
      val buck = bucketed.select("node", "pr_e12").as[(Long, Long)].collect().toSet
      assert(buck == plain && buck.size == 40)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_pr_edges_spec")
    }
  }

  test("amortized bucketed path: one write per (session, key), same ranks") {
    val orders = Seq((100L, 1L), (101L, 2L), (102L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((100L, 10L), (101L, 10L), (102L, 11L))
      .toDF("l_orderkey", "l_suppkey")
    // the cache must hand back the SAME table for the same key (no second
    // bucketed write) and a DIFFERENT table for a different key
    val t1 = Graph.bucketedEdgeTableOnce(spark, "spec-amortize",
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst", buckets = 2)
    val t2 = Graph.bucketedEdgeTableOnce(spark, "spec-amortize",
      sys.error("edge frame must not be re-evaluated on a cache hit"),
      "src", "dst", buckets = 2)
    val t3 = Graph.bucketedEdgeTableOnce(spark, "spec-amortize-other",
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst", buckets = 2)
    try {
      assert(t1 == t2 && t1 != t3)
      // and the registered entry point returns purchaseRank's exact longs
      // on both the first (build) and second (reuse) invocation
      val plain = Graph.purchaseRank(orders, li, iters = 3)
        .select("entity_key", "kind", "pr_e12")
        .as[(Long, String, Long)].collect().toSet
      val once1 = Graph.purchaseRankBucketedOnce(spark, "spec-amortize-rank",
        orders, li, iters = 3)
        .select("entity_key", "kind", "pr_e12")
        .as[(Long, String, Long)].collect().toSet
      val once2 = Graph.purchaseRankBucketedOnce(spark, "spec-amortize-rank",
        orders, li, iters = 3)
        .select("entity_key", "kind", "pr_e12")
        .as[(Long, String, Long)].collect().toSet
      assert(once1 == plain && once2 == plain)
    } finally {
      // a cache hit returns the rank run's table name without re-building —
      // with the SAME params the rank run used (a differing bucket count
      // now fails loudly, BuildOnceSpec)
      val tRank = Graph.bucketedEdgeTableOnce(spark, "spec-amortize-rank",
        Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
      Seq(t1, t3, tRank).distinct.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("purchaseRank: hub supplier outranks leaf customers") {
    // two customers each buy only from supplier 10; one customer buys
    // from supplier 11 too -> supplier 10 must outrank supplier 11, and
    // every customer row keys back to the original key space
    val orders = Seq((100L, 1L), (101L, 2L), (102L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((100L, 10L), (101L, 10L), (102L, 11L))
      .toDF("l_orderkey", "l_suppkey")
    val out = Graph.purchaseRank(orders, li, iters = 5)
      .select("entity_key", "kind", "pr_e12")
      .as[(Long, String, Long)].collect()
    val byKey = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(byKey((10L, "supplier")) > byKey((11L, "supplier")))
    assert(out.count(_._2 == "customer") == 2 && out.count(_._2 == "supplier") == 2)
  }
}
