package graft

import graft.operators.Drift

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("ksDrift on a hand-computed two-group case") {
    // A: values {1, 2}; B: values {3, 4}. A vs rest(B): CDFs disjoint,
    // max gap at x=2: F_A=1, F_B=0 -> KS=1. Symmetric for B.
    val docs = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "b", 3L), (4L, "b", 4L))
      .toDF("doc_id", "source", "n_chars")
    val out = Drift.ksDrift(docs).as[(String, Long, Double)].collect().toSet
    assert(out == Set(("a", 2L, 1.0), ("b", 2L, 1.0)))

    // identical distributions -> KS = 0
    val same = Seq(
      (1L, "a", 5L), (2L, "a", 7L), (3L, "b", 5L), (4L, "b", 7L))
      .toDF("doc_id", "source", "n_chars")
    val out2 = Drift.ksDrift(same).as[(String, Long, Double)].collect().toSet
    assert(out2 == Set(("a", 2L, 0.0), ("b", 2L, 0.0)))

    // partial overlap, hand-computed: A={1,1,3}, B={1,3,3}
    // at x=1: F_A=2/3, F_B=1/3 -> gap 1/3; at x=3 both 1 -> KS=1/3
    val mix = Seq(
      (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 3L),
      (4L, "b", 1L), (5L, "b", 3L), (6L, "b", 3L))
      .toDF("doc_id", "source", "n_chars")
    val out3 = Drift.ksDrift(mix).as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out3 == Map("a" -> 0.333333, "b" -> 0.333333))

    // single-source corpus: rest is empty -> defined as 0
    val solo = Seq((1L, "a", 1L), (2L, "a", 9L)).toDF("doc_id", "source", "n_chars")
    assert(Drift.ksDrift(solo).as[(String, Long, Double)].collect().toSeq ==
      Seq(("a", 2L, 0.0)))
  }
}
