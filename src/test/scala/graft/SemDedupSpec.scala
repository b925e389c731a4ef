package graft

import graft.operators.SemDedup

class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  // two tight direction groups; ids 0/2 are the smallest of their groups
  private val emb = Seq(
    (0L, Array(1f, 0.01f)), (2L, Array(0.99f, 0f)), (4L, Array(0.98f, 0.02f)),
    (1L, Array(0.01f, 1f)), (3L, Array(0f, 0.97f)),
    (5L, Array(-1f, -1f))) // far from both groups, alone in its cluster
    .toDF("vec_id", "embedding")

  test("smallest id per similarity group survives; dissimilar cluster-mates survive") {
    val out = SemDedup.semDedup(emb, k = 3, iters = 2, tau = 0.9)
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    val kept = out.filter(_._3).map(_._1).toSet
    val droppedIds = out.filterNot(_._3).map(_._1).toSet
    // group reps 0 and 1 survive; their near-copies 2, 3, 4 drop
    assert(kept.contains(0L) && kept.contains(1L) && kept.contains(5L), s"$out")
    assert(droppedIds == Set(2L, 3L, 4L), s"$out")
    // a dropped vector shares its cluster with a kept smaller id
    val cl = out.map(r => r._1 -> r._2).toMap
    droppedIds.foreach(d =>
      assert(out.exists(r => r._3 && r._1 < d && r._2 == cl(d)), s"$out"))
  }

  test("drops are cluster-scoped: lowering tau below cross-group cosine changes nothing across groups") {
    val strict = SemDedup.semDedup(emb, k = 3, iters = 2, tau = 0.9)
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    // tau 0.5 still exceeds the ~0.01 cross-group cosine -> same outcome
    val loose = SemDedup.semDedup(emb, k = 3, iters = 2, tau = 0.5)
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    assert(strict == loose)
  }

  test("partitioning-independent") {
    val a = SemDedup.semDedup(emb.repartition(5), k = 3, iters = 2, tau = 0.9)
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    val b = SemDedup.semDedup(emb.repartition(1), k = 3, iters = 2, tau = 0.9)
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
