package graft

import graft.operators.Bm25
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a a b x", "en"), // both terms, tf_a=2
    (1L, "a x x x", "en"), // one term, same dl
    (2L, "x x x x", "en"), // no query term -> excluded
    (3L, "b", "de")) // short doc, other lang
    .toDF("doc_id", "text", "lang")

  test("bm25 scores match the hand-computed formula and rank per language") {
    val out = Bm25.retrieve(docs, terms = Seq("a", "b"), k = 2)
      .as[(String, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq

    // collection stats over the 4 docs: N=4, tt=13, df_a=2, df_b=2
    val (n, tt) = (4.0, 13.0)
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double) =
      tf * (1.2 + 1.0) / (tf + 1.2 * (0.25 + 0.75 * dl * n / tt))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s0 = r4(idf(2) * w(2, 4) + idf(2) * w(1, 4)) // doc 0: tf_a=2, tf_b=1
    val s1 = r4(idf(2) * w(1, 4) + idf(2) * w(0, 4)) // doc 1: tf_a=1
    val s3 = r4(idf(2) * w(0, 1) + idf(2) * w(1, 1)) // doc 3: tf_b=1, dl=1

    assert(out == Seq(
      ("de", 3L, s3, 1),
      ("en", 0L, s0, 1), // two matching terms outrank one at equal dl
      ("en", 1L, s1, 2))) // doc 2 (no term) never appears
    assert(s0 > s1)
  }

  test("bm25 plan: no explode, stats broadcast, bounded top-k, one corpus shuffle") {
    val df = Bm25.retrieve(docs, terms = Seq("a", "b"), k = 2)
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    // tf comes from array HOFs over the split column, never a token
    // explode: the only Generate is the posexplode of the <=k winners
    val generates = s.linesIterator.filter(_.contains("Generate")).toSeq
    assert(generates.size == 1 && generates.head.contains("posexplode"),
      s"token explode in the BM25 plan:\n$s")
    // the one-row stats frame broadcasts; the corpus never re-shuffles for it
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      s"stats must broadcast:\n$s")
    // ranking is the bounded aggregator, not a window sort
    assert(s.contains("partial_boundedtopk"), s"top-k must be map-side bounded:\n$s")
    assert(!s.contains("Window"), s"no window sort:\n$s")
    // corpus-side data crosses at most: stats agg (1 row) + lang top-k
    val ex = plan.collect { case e: ShuffleExchangeExec => e }
    assert(ex.size <= 2, s"unexpected shuffles (${ex.size}):\n$s")
  }
}
