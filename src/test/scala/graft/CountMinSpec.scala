package graft

import graft.operators.{CountMin, CountMinAgg}
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  test("count-min never underestimates; overestimate bounded; merge = one-shot") {
    val agg = new CountMinAgg(64, 4)
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(i.toLong)))
    def h(x: Long) = (x * 0x9E3779B97F4A7C15L, x * 0xC2B2AE3D27D4EB4FL)
    val oneShot = stream.map(h).foldLeft(agg.zero)(agg.reduce)
    val merged = stream.map(h).grouped(23).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
    assert(oneShot.toSeq == merged.toSeq)

    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    for ((key, truth) <- trueCounts) {
      val (h1r, h2r) = h(key)
      val h1 = h1r & 0xFFFFFFFFL; val h2 = h2r & 0xFFFFFFFFL
      val est = (0 until 4).map(j =>
        oneShot(j * 64 + ((h1 + j.toLong * h2) & 63L).toInt)).min
      assert(est >= truth, s"key $key: est $est < true $truth")
      assert(est <= truth + 4L * n / 64 + 8, s"key $key: est $est too high vs $truth")
    }
  }

  test("topTokensGate: exact spine + sketch bound booleans over a DataFrame") {
    val docs = Seq(
      (1L, "x x x y y z"), (2L, "x y w"), (3L, "x q")).toDF("doc_id", "text")
    val out = CountMin.topTokensGate(docs, "text", k = 2, w = 256, d = 4)
      .as[(Int, String, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq == Seq((1, "x", 5L), (2, "y", 3L)))
    assert(out.forall(r => r._4 && r._5), s"cm gate failed: ${out.toSeq}")
  }
}
