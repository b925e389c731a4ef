package graft

import graft.operators.Repetition

class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  test("repetition signals on hand-computed documents") {
    val docs = Seq(
      (1L, "a a a b"), // 4 tokens, 2 distinct; top word a=3; bigrams: "a a"x2, "a b" -> 2/3
      (2L, "x y z"), // no repetition at all
      (3L, "q"), // single token: no bigrams
      (4L, "p p p p")) // total repetition
      .toDF("doc_id", "text")
    val out = Repetition.signals(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    assert(out(1L) == ((4L, 0.5, 0.75, 0.666667)))
    assert(out(2L) == ((3L, 0.0, 0.333333, 0.5))) // bigrams "x y","y z" both unique -> 1/2
    assert(out(3L) == ((1L, 0.0, 1.0, 0.0))) // bigram frac defined as 0
    assert(out(4L) == ((4L, 0.75, 1.0, 1.0)))
  }

  test("repetition shuffles carry no token arrays (explode-before-shuffle)") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val plan = Repetition.signals(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // every exchange moves (id, term, count)-shaped rows, never ArrayType
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("array<"), s"array rides a shuffle:\n$exchanges")
  }
}
