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
