package graft

import graft.operators.SpanDedup

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String)]) =
    SpanDedup.spanStats(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq

  test("a shared 10-token run marks exactly its positions in both docs") {
    // docs differ outside the run, so only grams fully inside s1..s10
    // repeat (starts 5..7 in each doc) — coverage is positions 5..14
    val run = (1 to 10).map(i => s"s$i").mkString(" ")
    val a = (1 to 5).map(i => s"u$i").mkString(" ") + " " + run + " " +
      (1 to 5).map(i => s"v$i").mkString(" ")
    val b = (1 to 5).map(i => s"x$i").mkString(" ") + " " + run + " " +
      (1 to 5).map(i => s"y$i").mkString(" ")
    assert(stats(Seq((1L, a), (2L, b))) == Seq(
      (1L, 20L, 10L, 0.5), (2L, 20L, 10L, 0.5)))
  }

  test("within-doc repetition is duplication too; short docs report zero") {
    // doc 3 repeats its own 8-gram: both occurrences covered, the pivot
    // token between them not; doc 4 is shorter than one gram
    val r = (1 to 8).map(i => s"r$i").mkString(" ")
    val c = r + " z " + r
    val out = stats(Seq((3L, c), (4L, "tiny doc of five words")))
    assert(out == Seq((3L, 17L, 16L, 0.941176), (4L, 5L, 0L, 0.0)))
  }

  test("an exact duplicate pair is fully covered; unique docs are untouched") {
    val dup = (1 to 12).map(i => s"d$i").mkString(" ")
    val uniq = (1 to 12).map(i => s"q$i").mkString(" ")
    val out = stats(Seq((5L, dup), (6L, dup), (7L, uniq)))
    assert(out == Seq((5L, 12L, 12L, 1.0), (6L, 12L, 12L, 1.0), (7L, 12L, 0L, 0.0)))
  }

  test("span removal keeps the canonical occurrence, trims the rest") {
    val run = (1 to 10).map(i => s"s$i").mkString(" ")
    val a = "u1 u2 " + run + " u3 u4"            // first occurrence -> canonical
    val b = "x1 x2 " + run + " x3 x4"            // later -> run trimmed
    val dup = (1 to 12).map(i => s"d$i").mkString(" ")
    val out = SpanDedup.removeSpans(Seq(
      (1L, a), (2L, b), (3L, dup), (4L, dup), (5L, "short doc")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 14L, 0L, a)))                       // canonical: untouched
    assert(out(1) == ((2L, 14L, 10L, "x1 x2 x3 x4")))          // shared run removed
    assert(out(2) == ((3L, 12L, 0L, dup)))                     // first copy survives
    assert(out(3) == ((4L, 12L, 12L, "")))                     // second copy empties
    assert(out(4) == ((5L, 2L, 0L, "short doc")))              // sub-window: untouched

    // within-doc: the SECOND occurrence of a self-repeated run trims
    val r = (1 to 8).map(i => s"r$i").mkString(" ")
    val self = SpanDedup.removeSpans(Seq((9L, r + " z " + r)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].head()
    assert(self == ((9L, 17L, 8L, r + " z")))
  }

  test("maximal spans coalesce adjacent coverage; the length threshold filters") {
    // doc 1/2 share a 20-token boilerplate region AND a separate 9-token
    // run, split by unique pivots: coverage has two islands per doc
    val big = (1 to 20).map(i => s"b$i").mkString(" ")
    val small = (1 to 9).map(i => s"m$i").mkString(" ")
    val a = big + " u1 u2 " + small
    val b = big + " x1 x2 " + small
    val spans = SpanDedup.maximalSpans(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), minSpanTokens = 16)
      .as[(Long, Long, Long)].collect().sortBy(s => (s._1, s._2)).toSeq
    // only the 20-token island survives the >= 16 filter, at pos 0..19
    assert(spans == Seq((1L, 0L, 20L), (2L, 0L, 20L)), s"$spans")
    // lowering the threshold to the gram size surfaces the 9-token island
    val all = SpanDedup.maximalSpans(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), minSpanTokens = 8)
      .as[(Long, Long, Long)].collect().sortBy(s => (s._1, s._2)).toSeq
    assert(all == Seq((1L, 0L, 20L), (1L, 22L, 9L), (2L, 0L, 20L), (2L, 22L, 9L)), s"$all")
  }

  test("span-thresholded removal trims only long runs, keeps short repeats") {
    val big = (1 to 20).map(i => s"b$i").mkString(" ")
    val small = (1 to 9).map(i => s"m$i").mkString(" ")
    val a = big + " u1 u2 " + small // canonical for both runs: untouched
    val b = big + " x1 x2 " + small // non-canonical occurrences
    val out = SpanDedup.removeSpans(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), minSpanTokens = 16)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 31L, 0L, a)))
    // doc 2: the 20-token run drops (>= 16), the 9-token run SURVIVES
    assert(out(1) == ((2L, 31L, 20L, "x1 x2 " + small)), s"${out(1)}")
    // with the threshold off, q78 semantics: both non-canonical runs drop
    val raw = SpanDedup.removeSpans(Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(raw(1) == ((2L, 31L, 29L, "x1 x2")), s"${raw(1)}")
  }
}
