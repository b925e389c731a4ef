package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  private val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")
  private def text(idxs: Seq[Int]) = idxs.map(i => words(i % words.length)).mkString(" ")

  // 0 = short quote; 1 = big page embedding the quote verbatim; 2/3 = exact
  // duplicates of each other; 4 = unrelated.
  private val docs = Seq(
    (0L, text(0 to 5)),
    (1L, text(0 to 5) + " " + text(Seq(7, 8, 9, 7, 9, 8, 7, 8))),
    (2L, text(Seq(3, 1, 4, 1, 5, 9, 2, 6))),
    (3L, text(Seq(3, 1, 4, 1, 5, 9, 2, 6))),
    (4L, text(Seq(9, 9, 8, 8, 7, 7, 6, 6, 5, 5))))
    .toDF("doc_id", "text")

  private def mine(thr: Double = 0.8) =
    Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = thr)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq

  test("a verbatim quote is contained in the larger page, not vice versa") {
    val out = mine()
    assert(out.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0), s"$out")
    assert(!out.exists(p => p._1 == 1L && p._2 == 0L), s"$out")
  }

  test("symmetric Jaccard misses the quote pair that containment catches") {
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.7)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(p => Set(p._1, p._2) == Set(0L, 1L)), s"${jac.toSeq}")
    assert(mine().exists(p => p._1 == 0L && p._2 == 1L))
  }

  test("exact duplicates emit both directions at containment 1.0") {
    val out = mine()
    assert(out.contains((2L, 3L, 1.0)) && out.contains((3L, 2L, 1.0)), s"$out")
  }

  test("prefix-filtered candidates are lossless vs the brute-force twin") {
    for (thr <- Seq(0.5, 0.8, 0.95)) {
      val shingle = docs.select(col("doc_id").as("id"),
        graft.functions.TextFunctions.shingles(col("text"), 3).as("sh"))
      val brute = shingle.as("a").join(shingle.as("b"), col("a.id") =!= col("b.id"))
        .select(col("a.id").as("contained_id"), col("b.id").as("container_id"),
          round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
            / size(col("a.sh")), 4).as("containment"))
        .filter(col("containment") >= thr)
        .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
      assert(mine(thr) == brute, s"threshold $thr")
    }
  }

  test("partitioning-independent") {
    val a = Dedup.containmentPairs(docs.repartition(5), "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(a == mine())
  }

  test("chunk-rectangle cap is lossless (maxPostings = 1 forces full chunking)") {
    val capped = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8, maxPostings = 1)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(capped == mine())
  }

  test("degenerate hot posting list: shared boilerplate shingle, capped join stays exact") {
    // Every doc opens with the same boilerplate trigram (df = n_docs) and a
    // short unique tail — short docs force the boilerplate shingle INTO the
    // prefix, the scenario that defeats the rarity argument. doc 0's full
    // text reappears inside doc 1.
    val boiler = text(Seq(0, 1, 2))
    val hot = (0L to 19L).map { i =>
      val tail = i match {
        case 0L => text(Seq(3, 4, 5, 6))
        case 1L => text(Seq(3, 4, 5, 6)) + " " + text(Seq(4, 8))
        case _  => text(Seq((i % 7 + 3).toInt, (i % 5 + 2).toInt, (i % 3 + 6).toInt))
      }
      (i, boiler + " " + tail)
    }.toDF("doc_id", "text")
    for (thr <- Seq(0.5, 0.8)) {
      val shingle = hot.select(col("doc_id").as("id"),
        graft.functions.TextFunctions.shingles(col("text"), 3).as("sh"))
      val brute = shingle.as("a").join(shingle.as("b"), col("a.id") =!= col("b.id"))
        .select(col("a.id").as("contained_id"), col("b.id").as("container_id"),
          round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
            / size(col("a.sh")), 4).as("containment"))
        .filter(col("containment") >= thr)
        .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
      val capped = Dedup.containmentPairs(hot, "doc_id", "text", 3, thr, maxPostings = 4)
        .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
      assert(capped == brute, s"threshold $thr")
      assert(brute.exists(p => p._1 == 0L && p._2 == 1L), s"hot corpus lost the planted pair: $brute")
    }
  }
}
