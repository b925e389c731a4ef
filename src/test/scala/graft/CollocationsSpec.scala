package graft

import graft.operators.Collocations

class CollocationsSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed PMI, ranked desc with bigram tiebreak") {
    // one doc: tokens p q p q p q -> n=6, nb=5, c(p)=c(q)=3,
    // c("p q")=3, c("q p")=2
    // PMI(p q) = ln(3*36/(5*9)) = ln(2.4) = 0.8755 (4 dp)
    // PMI(q p) = ln(2*36/(5*9)) = ln(1.6) = 0.4700
    val docs = Seq((1L, "p q p q p q", "en")).toDF("doc_id", "text", "lang")
    val out = Collocations.pmiTopK(docs, k = 10, minCount = 1)
      .as[(String, Int, String, Double)].collect().sortBy(_._2).toSeq
    assert(out == Seq(("en", 1, "p q", 0.8755), ("en", 2, "q p", 0.47)))
  }

  test("languages are independent; minCount prunes the tail") {
    val docs = Seq(
      (1L, "a b a b a b a b a b", "en"),   // c(a b)=5 survives minCount=5
      (2L, "c d", "en"),                   // c(c d)=1 pruned
      (3L, "a b", "fr"))                   // fr: c(a b)=1 pruned
      .toDF("doc_id", "text", "lang")
    val out = Collocations.pmiTopK(docs, k = 10, minCount = 5)
      .as[(String, Int, String, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._3)) == Seq(("en", "a b")))
  }

  test("plan: bounded top-k, no window sort, stats broadcast") {
    val docs = Seq((1L, "p q p q", "en")).toDF("doc_id", "text", "lang")
    val s = Collocations.pmiTopK(docs).queryExecution.executedPlan.toString
    assert(s.contains("partial_boundedtopk"), s"map-side bounded ranking:\n$s")
    assert(!s.contains("Window"), s"no window sort:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"per-lang totals must broadcast:\n$s")
  }
}
