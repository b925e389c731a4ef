package graft

import graft.operators.Dsir
import graft.plans.HashFunctions
import org.apache.spark.sql.functions.col

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def refHash(s: String, buckets: Int): Int =
    (s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
      % buckets).toInt

  test("ngramBuckets kernel = unigrams then bigrams under the polynomial hash") {
    val out = Seq("a b c").toDF("text")
      .select(HashFunctions.ngramBuckets(col("text"), 1, 2, 64).as("f"))
      .as[Seq[Int]].head()
    val expect = Seq("a", "b", "c", "a b", "b c").map(refHash(_, 64))
    assert(out == expect)
  }

  test("target-like documents score higher than off-target documents") {
    // en docs speak vocabulary A, fr docs vocabulary B; a held-out en-style
    // doc must outweigh a fr-style doc regardless of its label
    val docs = (
      (0L until 20L).map(i => (i, "alpha beta gamma delta", "en")) ++
      (20L until 40L).map(i => (i, "un deux trois quatre", "fr")) ++
      Seq((100L, "alpha beta gamma delta", "xx"), (101L, "un deux trois quatre", "xx")))
      .toDF("doc_id", "text", "lang")
    val w = Dsir.importanceWeights(docs, targetLang = "en", buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(100L) > w(101L), s"$w")
    assert(w(0L) > w(20L), s"$w")
  }

  test("weights are partitioning-independent") {
    val docs = (0L until 50L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} tok${i % 11}", if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val a = Dsir.importanceWeights(docs.repartition(8), buckets = 32)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Dsir.importanceWeights(docs.repartition(1), buckets = 32)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("plan: the model broadcasts; the corpus never sort-merge-joins it") {
    val docs = (0L until 50L)
      .map(i => (i, "alpha beta", if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val s = Dsir.importanceWeights(docs).queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"ratio table must broadcast:\n$s")
  }
}
