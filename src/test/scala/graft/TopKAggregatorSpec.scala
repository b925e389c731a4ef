package graft

import graft.operators.{Scored, TopKAggregator}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property (seeded randomized): the bounded-insert aggregator matches a
  * sort-based top-k for any input split across any reduce/merge tree.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private def reference(xs: Seq[Scored], k: Int): Seq[Long] =
    xs.sortBy(s => (-s.score, s.id)).take(k).map(_.id)

  test("reduce+merge matches sort-based top-k over 500 random cases") {
    val rnd = new Random(42)
    for (_ <- 1 to 500) {
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      // small id/score ranges force ties through the tie-break path
      val xs = Seq.fill(n)(Scored(rnd.nextInt(30).toLong, rnd.nextInt(10) / 10.0))
      val split = if (n == 0) 0 else rnd.nextInt(n)
      val agg = new TopKAggregator(k)
      val (l, r) = xs.splitAt(split)
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufL, bufR)) == reference(xs, k),
        s"k=$k xs=$xs split=$split")
    }
  }

  test("buffer never exceeds k and keeps the best") {
    val agg = new TopKAggregator(3)
    val buf = (1 to 100).map(i => Scored(i.toLong, i.toDouble)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.size == 3)
    assert(agg.finish(buf) == Seq(100L, 99L, 98L))
  }
}
