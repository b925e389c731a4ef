package graft

import graft.operators.QualityRules

class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def words(w: String, n: Int): String = Seq.fill(n)(w).mkString(" ")

  test("each rule trips on its own pathology; clean text passes") {
    val docs = Seq(
      (1L, "the cat sat on the mat and then a dog came in to see it " +
        "and the mat was warm so they stayed for a while longer"), // clean
      (2L, "too short a doc"),                                     // r_word_count
      (3L, words("zzzzzzzzzzzzzz", 25)),                           // r_mean_len (+stopwords)
      (4L, ("the a " + words("x#", 23))),                          // r_symbols
      (5L, words("12345", 25)))                                    // r_alpha (+stopwords)
      .toDF("doc_id", "text")
    val out = QualityRules.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("r_word_count"), r.getAs[Boolean]("r_mean_len"),
          r.getAs[Boolean]("r_alpha"), r.getAs[Boolean]("r_stopwords"),
          r.getAs[Boolean]("r_symbols"), r.getAs[Boolean]("passes")))
      .toMap
    assert(out(1L) == ((true, true, true, true, true, true)), s"$out")
    assert(!out(2L)._1 && !out(2L)._6)
    assert(!out(3L)._2 && !out(3L)._4 && !out(3L)._6)
    assert(out(4L)._1 && !out(4L)._5 && !out(4L)._6)
    assert(!out(5L)._3 && !out(5L)._4 && !out(5L)._6)
  }

  test("gate is scan-shaped: no shuffle, no join") {
    val docs = Seq((1L, "the a b")).toDF("doc_id", "text")
    val plan = QualityRules.gopherRules(docs).queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"), s"expected scan shape:\n$plan")
  }
}
