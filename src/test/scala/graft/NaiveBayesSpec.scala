package graft

import graft.operators.NaiveBayes

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  test("nb langid: learns separable classes and scores held-out docs") {
    // even ids train, odd ids test; two clearly separable vocabularies
    val docs = Seq(
      (0L, "alpha alpha beta", "en"), (2L, "alpha beta beta", "en"),
      (4L, "zeta eta eta", "de"), (6L, "zeta zeta eta", "de"),
      (1L, "alpha beta alpha", "en"), // en vocabulary -> en
      (3L, "eta zeta zeta", "de"), // de vocabulary -> de
      (5L, "alpha zeta novel", "en")) // mixed + unseen token
      .toDF("doc_id", "text", "lang")
    val out = NaiveBayes.langClassifier(docs)
      .as[(Long, String, String, Int)].collect().sortBy(_._1).toSeq

    assert(out.map(_._1) == Seq(1L, 3L, 5L))
    assert(out(0) == ((1L, "en", "en", 1)))
    assert(out(1) == ((3L, "de", "de", 1)))
    // doc 5: "alpha" (en-only) vs "zeta" (de-only) cancel, "novel" is
    // unseen in both -> the priors tie (2 docs each) and the smoothed
    // likelihoods are symmetric: the tiebreak must pick "de" (smallest)
    assert(out(2)._3 == "de")

    // hand-check doc 1 against the driver-side formula: both classes have
    // 6 train tokens, vocab = 4, priors ln(1/2)
    def lp(cnt: Long) = math.log((cnt + 1.0) / (6 + 4).toDouble)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sEn = r4(math.log(0.5) + 2 * lp(3) + 1 * lp(3)) // alpha x2, beta x1 in en
    val sDe = r4(math.log(0.5) + 2 * lp(0) + 1 * lp(0)) // both unseen in de
    assert(sEn > sDe, s"en must win the hand-computed margin ($sEn vs $sDe)")
  }

  test("nb langid plan: model broadcasts, corpus never shuffles against it") {
    val docs = (0L until 40L)
      .map(i => (i, if (i % 4 < 2) "alpha beta" else "zeta eta",
        if (i % 4 < 2) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val df = NaiveBayes.langClassifier(docs)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"model must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s"corpus must not sort-merge against the model:\n$s")
    // perfect separation on held-out docs
    val out = df.as[(Long, String, String, Int)].collect()
    assert(out.length == 20 && out.forall(_._4 == 1))
  }
}
