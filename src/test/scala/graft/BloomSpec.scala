package graft

import graft.operators.Bloom

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom prefilter: zero false negatives, fp rate near theory") {
    val keys = (0L until 500L).map(i => i * 3).toDF("k") // members: multiples of 3
    val numBits = 1 << 13
    val bloom = Bloom.build(keys, "k", numBits, k = 5)

    val probe = (0L until 6000L).toDF("p")
    val passed = Bloom.prefilter(probe, "p", bloom, numBits, k = 5)
      .as[Long].collect().toSet
    // every true member passes
    (0L until 500L).map(_ * 3).foreach(m => assert(passed.contains(m), s"missed $m"))
    // false positives bounded: theory (1-e^(-kn/m))^k ~ 0.009 at n=500,m=8192,k=5
    val fps = passed.count(p => p % 3 != 0 || p >= 1500)
    val nonMembers = 6000 - 500
    assert(fps <= nonMembers * 0.03, s"fp rate ${fps.toDouble / nonMembers} too high")
  }

  test("bloom build is merge-order independent (distributed OR)") {
    val agg = new graft.operators.BloomAgg(1 << 10, 3)
    val ins = Seq((11L, 7L), (42L, 99L), (-5L, 3L), (Long.MaxValue, Long.MinValue))
    val oneShot = ins.foldLeft(agg.zero)(agg.reduce)
    val split = agg.merge(
      ins.take(2).foldLeft(agg.zero)(agg.reduce),
      ins.drop(2).foldLeft(agg.zero)(agg.reduce))
    assert(oneShot.toSeq == split.toSeq)
  }

  test("semiJoinGate emits the exact count and TRUE gates") {
    val fact = (1L to 300L).toDF("c_custkey")
    val dim = Seq(10L, 20L, 20L, 30L, 999L).toDF("o_custkey") // 999 not in fact
    val out = Bloom.semiJoinGate(fact, "c_custkey", dim, "o_custkey", 1 << 10, 4)
      .as[(Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq((3L, true, true)))
  }
}
