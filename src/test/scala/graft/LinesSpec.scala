package graft

import graft.operators.Lines

class LinesSpec extends SparkTestBase {
  import spark.implicits._

  test("cross-doc repeated lines removed everywhere; within-doc repeats and blanks survive") {
    val docs = Seq(
      (1L, "alpha one\nCOOKIE BANNER\nbeta two\ngamma three"),
      (2L, "delta four\ncookie   banner\nepsilon five\nzeta six"), // normalized match
      (3L, "unique a\n   \nunique b"), // whitespace line: structural, never counted
      (4L, "COOKIE BANNER\ncookie banner\nomega"), // 2 of 3 lines boilerplate
      (5L, "self repeat\nself repeat\nunique bits")) // within-ONE-doc repeat: not boilerplate
      .toDF("doc_id", "text")

    val out = Lines.lineDedup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4), r.getString(5)))).toMap

    assert(out(1L) == ((4L, 1L, 0.25, true, "alpha one\nbeta two\ngamma three")))
    assert(out(2L) == ((4L, 1L, 0.25, true, "delta four\nepsilon five\nzeta six")))
    // blank line is neither counted (n_lines = 2) nor removed
    assert(out(3L) == ((2L, 0L, 0.0, true, "unique a\n   \nunique b")))
    // the escalation rule: a mostly-boilerplate doc is dropped
    assert(out(4L) == ((3L, 2L, 0.6667, false, "omega")))
    // cross-doc rule: a line repeated only inside one doc is content
    assert(out(5L) == ((3L, 0L, 0.0, true, "self repeat\nself repeat\nunique bits")))
  }
}
