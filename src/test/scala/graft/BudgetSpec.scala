package graft

import graft.operators.{Budget, Sampling}
import org.apache.spark.sql.functions._

class BudgetSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, g: String, nTokens: Int) =
    (id, g, Seq.fill(nTokens)("w").mkString(" "))

  // group a: 20 tokens total, group b: 100. budget = 120*16/10 = 192.
  // caps (E=2): a=40, b=200. Water-fill: a capped (40*2 <= 192), b gets
  // (192-40)/1 = 152 -> 1 full epoch + 52-token partial = 5 of its 10 docs.
  private val docs = (
    Seq(doc(0L, "a", 10), doc(1L, "a", 10)) ++
      (10L to 19L).map(doc(_, "b", 10))
  ).toDF("doc_id", "lang", "text")

  private def alloc() =
    Budget.epochCappedAllocation(docs, buckets = 4)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq

  test("capped group repeats every doc exactly maxEpochs times") {
    val a = alloc().filter(_._2 == "a")
    assert(a.map(_._4) == Seq(2L, 2L), s"$a")
  }

  test("uncapped group gets full epochs plus a hash-prefix partial epoch") {
    val b = alloc().filter(_._2 == "b")
    assert(b.map(_._4).sorted == Seq(1L, 1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L, 2L))
    // the docs with the extra repeat are exactly the 5 smallest by LCG hash
    val hashOrder = b.map(_._1).sortBy(id =>
      (Sampling.HashMod + (id % Sampling.HashMod) * Sampling.HashMulA
        + Sampling.HashAddB) % Sampling.HashMod)
    val extra = b.filter(_._4 == 2L).map(_._1).toSet
    assert(hashOrder.take(5).toSet == extra, s"$b")
  }

  test("token conservation: allocation never exceeds the budget") {
    val out = alloc()
    val spent = out.map(r => r._3 * r._4).sum
    assert(spent <= 192L, s"spent $spent")
    // capped group spends exactly its cap
    assert(out.filter(_._2 == "a").map(r => r._3 * r._4).sum == 40L)
  }

  test("partitioning-independent") {
    val a = Budget.epochCappedAllocation(docs.repartition(7), buckets = 4)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == alloc())
  }

  test("null text and null group rows are excluded; empty input yields empty spine") {
    val withNulls = docs.unionByName(
      Seq((90L, null.asInstanceOf[String], "x y"), (91L, "a", null.asInstanceOf[String]))
        .toDF("doc_id", "lang", "text"))
    val out = Budget.epochCappedAllocation(withNulls, buckets = 4)
      .as[(Long, String, Long, Long)].collect()
    assert(!out.exists(r => r._1 == 90L || r._1 == 91L))
    val empty = Budget.epochCappedAllocation(docs.limit(0), buckets = 4).collect()
    assert(empty.isEmpty)
  }
}
