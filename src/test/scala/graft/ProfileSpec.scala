package graft

import graft.operators.Profile

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some(1.5), Some("ab")),
    (Some(2L), Some(2.5), Some("abcd")),
    (Some(2L), None, Some("ab")),
    (None, Some(4.0), None))
    .toDF("k", "x", "s")

  test("profile: hand-computed metrics per column kind") {
    val out = Profile.profile(df).as[(String, String, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("k", "n_nulls")) == 1.0)
    assert(out(("k", "n_distinct")) == 2.0)
    assert(out(("k", "min")) == 1.0 && out(("k", "max")) == 2.0)
    assert(out(("k", "mean")) == 1.666667) // rounded 6 dp
    assert(out(("x", "n_nulls")) == 1.0)
    assert(out(("x", "mean")) == 2.666667)
    assert(out(("s", "n_nulls")) == 1.0)
    assert(out(("s", "n_distinct")) == 2.0)
    assert(out(("s", "min_len")) == 2.0 && out(("s", "max_len")) == 4.0)
    assert(out(("s", "mean_len")) == 2.666667)
  }

  test("profile is partitioning-independent (decimal-accumulated means)") {
    val a = Profile.profile(df).as[(String, String, Double)].collect().toSet
    val b = Profile.profile(df.repartition(7)).as[(String, String, Double)]
      .collect().toSet
    assert(a == b)
  }

  test("profile of a column subset keeps only those columns") {
    val cols = Profile.profile(df, Seq("k")).as[(String, String, Double)]
      .collect().map(_._1).toSet
    assert(cols == Set("k"))
  }
}
