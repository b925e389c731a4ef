package graft

import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.plans.HashFunctions
import org.apache.spark.sql.functions._

import scala.util.Random

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Seeded corpus with planted near-duplicate clusters: 40 base docs of
    * 30 random words, plus a 1-word-mutated copy for every third doc.
    */
  private lazy val corpus = {
    val rnd = new Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi")
    val base = (0 until 40).map(i => (i.toLong, Seq.fill(30)(vocab(rnd.nextInt(vocab.size)))))
    val mutated = base.collect { case (i, words) if i % 3 == 0 =>
      (100L + i, words.updated(rnd.nextInt(words.size), vocab(rnd.nextInt(vocab.size))))
    }
    (base ++ mutated).map { case (id, w) => (id, w.mkString(" ")) }.toDF("doc_id", "text")
  }

  test("minhash+LSH pairs equal brute-force jaccard pairs on the seeded corpus") {
    val brute = Dedup.ngramJaccardPairs(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashPairs(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "corpus must contain near-dup pairs for this test to bite")
    assert(lsh == brute)
  }

  test("simhash chunk blocking finds exactly the brute-force hamming<=3 pairs") {
    val fp = corpus.select($"doc_id",
      HashFunctions.simHash64(TextFunctions.tokens($"text")).as("sim"))
    val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        bit_count($"a.sim".bitwiseXOR($"b.sim")).cast("int").as("h"))
      .filter($"h" <= 3)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    val blocked = Dedup.simHashPairs(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked == brute)
  }

  test("exact dedup collapses normalization-equivalent copies") {
    val docs = Seq(
      (1L, "Hello  World"),
      (2L, "  hello world "),
      (3L, "HELLO\tWORLD"),
      (4L, "different doc")).toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 4L -> 1L))
    val survivors = Dedup.exactSurvivors(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L))
  }

  test("shingles of short documents are empty, not a crash") {
    val docs = Seq((1L, "one two"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val out = docs.select(size(TextFunctions.shingles($"text", 3)).as("n")).as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 0))
    // and the full pipelines tolerate them
    assert(Dedup.minHashPairs(docs, "doc_id", "text").count() == 0)
  }

  test("simhash default is uncapped: hot buckets still yield all pairs") {
    // 30 identical docs share every chunk bucket; a capped default would
    // silently drop pairs (the sf0.1 bug) - all C(30,2) must come back
    val dup = (0 until 30).map(i => (i.toLong, "same text again and again here"))
      .toDF("doc_id", "text")
    assert(Dedup.simHashPairs(dup, "doc_id", "text").count() == 435)
  }

  test("hot-bucket cap bounds candidate generation") {
    // 30 identical docs: uncapped LSH would emit 435 pairs; cap=5 keeps
    // the 5 lowest ids per bucket -> C(5,2) = 10 pairs.
    val dup = (0 until 30).map(i => (i.toLong, "same text again and again here")).toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(dup, "doc_id", "text", bucketCap = 5)
    assert(pairs.count() == 10)
  }
}
