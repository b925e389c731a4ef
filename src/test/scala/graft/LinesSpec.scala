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

  test("intra-doc dedup keeps first occurrence, blanks structural, escalation flag") {
    val docs = Seq(
      (1L, "one\ntwo\nONE  \nthree\ntwo"), // normalized repeats of lines 0 and 1
      (2L, "a\n \na\nb"), // blank stays in place, second 'a' drops
      (3L, "x\nx\nx\ny"), // 3 of 4 content lines are one class: 2 dupes, frac 0.5
      (4L, "loop\nloop\nloop\nloop"), // 0.75 > maxDupFrac: flagged drop
      (5L, "all\ndistinct\nlines")) // untouched
      .toDF("doc_id", "text")

    val out = Lines.intraDocDedup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4), r.getString(5)))).toMap

    // first occurrences survive IN ORDER; later normalized copies drop
    assert(out(1L) == ((5L, 2L, 0.4, true, "one\ntwo\nthree")))
    // whitespace line neither counted (n_lines = 3) nor deduped nor moved
    assert(out(2L) == ((3L, 1L, 0.3333, true, "a\n \nb")))
    assert(out(3L) == ((4L, 2L, 0.5, true, "x\ny")))
    assert(out(4L) == ((4L, 3L, 0.75, false, "loop")))
    assert(out(5L) == ((3L, 0L, 0.0, true, "all\ndistinct\nlines")))
  }

  test("intra-doc dedup is independent of cross-doc repetition") {
    // the same line in two docs is NOT intra-doc repetition
    val docs = Seq((1L, "shared\nmine"), (2L, "shared\nyours"))
      .toDF("doc_id", "text")
    val out = Lines.intraDocDedup(docs, "doc_id", "text").collect()
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.map(_.getString(5)).toSet == Set("shared\nmine", "shared\nyours"))
  }
}
