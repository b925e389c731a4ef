package graft

import graft.operators.{HeavyHitters, SpaceSaving}

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("SpaceSaving with capacity >= vocabulary is exact") {
    val ss = new SpaceSaving(16)
    val stream = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val buf = stream.foldLeft(ss.zero)(ss.reduce)
    assert(ss.finish(buf) == Seq(("a", 5L, 0L), ("b", 3L, 0L), ("c", 2L, 0L)))
  }

  test("SpaceSaving under eviction keeps the two-sided bound, incl. merge") {
    // capacity 3, heavy item 'h' interleaved with 20 singletons
    val singles = (1 to 20).map(i => f"s$i%02d")
    val stream = new scala.util.Random(42).shuffle(Seq.fill(30)("h") ++ singles)
    val ss = new SpaceSaving(3)
    // split across 4 "partitions", reduce each, then merge — the
    // distributed execution shape
    val merged = stream.grouped(13).toSeq
      .map(_.foldLeft(ss.zero)(ss.reduce))
      .reduce(ss.merge)
    val out = ss.finish(merged)
    assert(out.size <= 3)
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every reported (est, err): true <= est <= true + err, err <= N/m-ish
    for ((t, est, err) <- out) {
      val truth = trueCounts.getOrElse(t, 0L)
      assert(est >= truth, s"$t: est $est < true $truth")
      assert(est - err <= truth, s"$t: est-err ${est - err} > true $truth")
    }
    // the heavy hitter (30 of 50 items) must be present and ranked first
    assert(out.head._1 == "h")
  }

  test("topTokensGate: exact spine + sketch containment/bound booleans") {
    val docs = Seq(
      (1L, "x x x y y z"), (2L, "x y w"), (3L, "x q")).toDF("doc_id", "text")
    val out = HeavyHitters.topTokensGate(docs, "text", k = 2, m = 64)
      .as[(Int, String, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, "x", 5L), (2, "y", 3L)))
    assert(out.forall(r => r._4 && r._5), s"sketch gate failed: ${out.toSeq}")
  }
}
