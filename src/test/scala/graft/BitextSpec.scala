package graft

import graft.operators.Bitext
import org.apache.spark.sql.functions._

class BitextSpec extends SparkTestBase {
  import spark.implicits._

  // X = {0, 2, 4}, Y = {1, 3, 5}. 0↔1 and 2↔3 are clear translations
  // (near-identical directions); 4 and 5 are hubs: moderately close to
  // everything on the other side but not each other's best by margin.
  private val xs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f)),
    (4L, Array(0.6f, 0.6f, 0.5f)))
    .toDF("vec_id", "embedding")
  private val ys = Seq(
    (1L, Array(0.99f, 0.02f, 0f)),
    (3L, Array(0.01f, 0.98f, 0f)),
    (5L, Array(0.6f, 0.58f, 0.52f)))
    .toDF("vec_id", "embedding")

  private def mine(k: Int = 2, thr: Double = 1.0) =
    Bitext.marginMine(xs, ys, "vec_id", "embedding", k, thr)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq

  test("true pairs are mined as mutual best-margin matches") {
    val pairs = mine().map(p => (p._1, p._2))
    assert(pairs.contains((0L, 1L)) && pairs.contains((2L, 3L)), s"${mine()}")
  }

  test("pairs are mutual: each side appears at most once") {
    val out = mine()
    assert(out.map(_._1).distinct.size == out.size)
    assert(out.map(_._2).distinct.size == out.size)
  }

  test("threshold prunes: a high floor keeps only the sharpest pair margins") {
    val all = mine()
    val floor = all.map(_._3).max
    val pruned = mine(thr = floor)
    assert(pruned.nonEmpty && pruned.size <= all.size)
    assert(pruned.forall(_._3 >= floor))
  }

  test("margin beats raw cosine on hubs: the hub pair's margin ranks below the true pairs'") {
    val out = mine()
    val byPair = out.map(p => (p._1, p._2) -> p._3).toMap
    byPair.get((4L, 5L)).foreach { hubMargin =>
      assert(byPair((0L, 1L)) > hubMargin && byPair((2L, 3L)) > hubMargin, s"$out")
    }
  }

  test("partitioning-independent") {
    val a = Bitext.marginMine(xs.repartition(4), ys.repartition(3),
      "vec_id", "embedding", 2, 1.0)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == mine())
  }

  test("null embeddings are ignored, not scored") {
    val xsN = xs.unionByName(Seq((9L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding"))
    val out = Bitext.marginMine(xsN, ys, "vec_id", "embedding", 2, 1.0)
      .as[(Long, Long, Double)].collect()
    assert(!out.exists(_._1 == 9L))
  }

  test("candidates plumbing is lossless: an all-pairs generator equals the exact path") {
    val allPairs = (x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =>
      x.select("xid").crossJoin(y.select("yid"))
    val viaCand = Bitext.marginMine(xs, ys, "vec_id", "embedding", 2, 1.0,
      candidates = Some(allPairs))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaCand == mine())
  }

  // 8 tight clusters split across the two collections — the shape real
  // bitext has (translations are near-identical directions). LSH buckets
  // align with clusters, so the candidate mine must recover every exact
  // pair and the gate must pass.
  private def clustered = {
    val rows = for (c <- 0 until 8) yield {
      val center = (0 until 16).map(j => math.sin(c * 16 + j + 1).toFloat).toArray
      val jittered = center.zipWithIndex.map { case (v, j) =>
        v + 0.01f * math.cos(j + c).toFloat }
      Seq((c * 10L, (c % 5).longValue, center),
        (c * 10L + 1, 5L + c % 5, jittered))
    }
    rows.flatten.toDF("vec_id", "label", "embedding")
  }

  test("clustered corpus: LSH candidates recover the exact mine (recall 1.0)") {
    val emb = clustered
    val xsC = emb.filter($"label" < 5)
    val ysC = emb.filter($"label" >= 5)
    val exact = Bitext.marginMine(xsC, ysC, "vec_id", "embedding", 4, 1.0)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val lsh = Bitext.marginMine(xsC, ysC, "vec_id", "embedding", 4, 1.0,
      candidates = Some(Bitext.lshCandidates()))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(exact.nonEmpty, "clustered corpus must mine at least one pair")
    assert(exact.map(p => (p._1, p._2)).toSet.subsetOf(
      lsh.map(p => (p._1, p._2)).toSet), s"exact=$exact lsh=$lsh")
    val gate = Bitext.marginMineGate(emb, 4, 1.0, floor = 1.0)
      .as[(Long, Boolean)].collect()
    assert(gate.length == 1 && gate.head._2, s"${gate.toSeq}")
    assert(gate.head._1 == exact.size)
  }
}
