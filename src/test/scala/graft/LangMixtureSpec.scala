package graft

import graft.operators.NaiveBayes

class LangMixtureSpec extends SparkTestBase {
  import spark.implicits._

  private def words(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")

  // even ids train the model: "aa" speaks x, "bb" speaks y.
  // odd ids are profiled: 1 = pure aa; 3 = 16 x then 16 y (one chunk each);
  // 5 = 16 y then 32 x (one bb chunk, two aa chunks).
  private val docs = Seq(
    (0L, "aa", words("x", 32)),
    (2L, "bb", words("y", 32)),
    (1L, "aa", words("x", 32)),
    (3L, "aa", words("x", 16) + " " + words("y", 16)),
    (5L, "bb", words("y", 16) + " " + words("x", 32)))
    .toDF("doc_id", "lang", "text")

  private val out = NaiveBayes.chunkMixture(docs, window = 16)
    .as[(Long, Long, Long, String, Double, Int)].collect()
    .map(r => r._1 -> r).toMap

  test("pure doc: one language, zero entropy, not mixed") {
    val (_, nChunks, nLangs, major, ent, mixed) = out(1L)
    assert(nChunks == 2 && nLangs == 1 && major == "aa" && ent == 0.0 && mixed == 0)
    assert(1.0 / ent > 0, "entropy must be +0.0, not -0.0")
  }

  test("even split: both languages detected, majority ties to smallest class, ln 2 entropy") {
    val (_, nChunks, nLangs, major, ent, mixed) = out(3L)
    assert(nChunks == 2 && nLangs == 2 && mixed == 1)
    assert(major == "aa", s"tie must break to the smallest class, got $major")
    assert(math.abs(ent - 0.6931) < 1e-9)
  }

  test("uneven mix: majority follows the vote count, entropy matches ln n - (sum c ln c)/n") {
    val (_, nChunks, nLangs, major, ent, mixed) = out(5L)
    assert(nChunks == 3 && nLangs == 2 && mixed == 1 && major == "aa")
    val expected = BigDecimal(math.log(3) - 2 * math.log(2) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ent == expected, s"$ent vs $expected")
  }

  test("partitioning-independent") {
    val a = NaiveBayes.chunkMixture(docs.repartition(5), window = 16)
      .as[(Long, Long, Long, String, Double, Int)].collect().sortBy(_._1).toSeq
    val b = out.values.toSeq.sortBy(_._1)
    assert(a == b)
  }
}
