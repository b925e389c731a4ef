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
    val brute = Dedup.ngramJaccardPairsNaive(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashPairs(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "corpus must contain near-dup pairs for this test to bite")
    assert(lsh == brute)
  }

  test("dedup stats: per-source exact and near-dup counts with known plants") {
    val w = (0 until 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // source A: 3 docs, one exact pair -> 1 exact dup; the pair is also
      // a (trivial) near-dup pair -> 2 near-dup docs
      (1L, "A", w), (2L, "A", w), (3L, "A", "totally different text body here"),
      // source B: 2 docs, near-dup but not exact (1 word changed)
      (10L, "B", w), (11L, "B", w.replace("w3", "zz")),
      // source C: 1 unique doc
      (20L, "C", "the only document in this source entirely"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.dedupStats(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 3L, 1L, 2L, 0.3333, 0.6667)), s"${out("A")}")
    assert(out("B")._2 == 2L && out("B")._3 == 0L && out("B")._4 == 2L, s"${out("B")}")
    assert(out("C") == (("C", 1L, 0L, 0L, 0.0, 0.0)), s"${out("C")}")
  }

  test("source matrix: attribution rows with known cross-source plants") {
    val w = (0 until 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // A-internal exact pair + both near-dup B's doc -> diagonal (A,A)
      // row and a cross (A,B) row; C's unique doc appears nowhere
      (1L, "A", w), (2L, "A", w),
      (10L, "B", w.replace("w3", "zz")),
      (20L, "C", "the only document in this source entirely"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.nearDupSourceMatrix(docs, "doc_id", "text", "source")
      .as[(String, String, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set(("A", "A"), ("A", "B")), s"${out.keySet}")
    // (A,A): the one exact pair over a 2-doc universe -> rate 1, j = 1
    assert(out(("A", "A")) == (("A", "A", 1L, 2L, 1.0, 1.0)), s"${out(("A", "A"))}")
    // (A,B): both A docs pair with B's mutated doc; universe 2*1
    val ab = out(("A", "B"))
    assert(ab._3 == 2L && ab._4 == 3L && ab._6 == 1.0, s"$ab")
    assert(ab._5 > 0.7 && ab._5 < 1.0, s"cross-source mean jaccard: $ab")
  }

  test("leakage-safe split: cluster members share a split; singletons match q79") {
    val out = Dedup.leakageSafeSplits(corpus, "doc_id", "text")
      .as[(Long, Long, String)].collect()
    assert(out.length == corpus.count())
    // every near-dup pair ends up on the same side
    val bySplit = out.map(r => r._1 -> r._3).toMap
    val pairs = Dedup.minHashPairs(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(bySplit(a) == bySplit(b), s"pair ($a, $b) split across ${bySplit(a)}/${bySplit(b)}")
    }
    // unclustered docs: split_key = own id and the label equals q79's
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val q79 = graft.operators.Sampling.assignSplits(corpus.select("doc_id"), "doc_id")
      .as[(Long, String)].collect().toMap
    out.filterNot(r => clustered(r._1)).foreach { r =>
      assert(r._2 == r._1 && r._3 == q79(r._1), s"$r")
    }
  }

  test("canonical picks: longest member wins per cluster, ties to smallest id") {
    // cluster A: 0 and 1 near-identical, 1 is longer -> 1 canonical;
    // cluster B: 10/11/12 identical text (tie) -> smallest id 10 wins;
    // 20 is unrelated -> no decision row at all
    val w = (0 until 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, w), (1L, w + " extra trailing words"),
      (10L, "same same same words here repeated thrice over"),
      (11L, "same same same words here repeated thrice over"),
      (12L, "same same same words here repeated thrice over"),
      (20L, "completely different text about nothing at all whatsoever"))
      .toDF("doc_id", "text")
    val out = Dedup.canonicalPicks(docs, "doc_id", "text")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 10L, 11L, 12L), s"$out")
    val keep = out.filter(_._4).map(_._1)
    assert(keep == Seq(1L, 10L), s"$out")
    assert(out.forall(r => r._3 == (if (r._1 <= 1L) 1L else 10L)), s"$out")
  }

  test("prefix-filtered jaccard equals all-pairs, including on boilerplate-heavy text") {
    // the adversarial input for an inverted index: a stop-shingle in every
    // doc. Prefix filtering must still find exactly the true pairs while
    // (by construction) mostly not indexing the hot shingle.
    val rnd = new Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val boiler = "click here to subscribe now" // shared by every doc
    val base = (0 until 30).map { i =>
      (i.toLong, boiler + " " + Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = base.collect { case (i, t) if i % 4 == 0 =>
      (200L + i, t + " " + vocab(rnd.nextInt(vocab.size)))
    }
    val noisy = (base ++ dups).toDF("doc_id", "text")
    for (c <- Seq(corpus, noisy); t <- Seq(0.5, 0.7, 0.9)) {
      val naive = Dedup.ngramJaccardPairsNaive(c, "doc_id", "text", threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val prefix = Dedup.ngramJaccardPairsPrefix(c, "doc_id", "text", threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefix == naive, s"prefix filter diverged at t=$t")
      val fullIndex = Dedup.ngramJaccardPairs(c, "doc_id", "text", threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(fullIndex == naive, s"full index diverged at t=$t")
    }
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

  test("shingled simhash equals its brute-force twin and excludes shingle-less docs") {
    // same covering-design losslessness, different feature basis: the
    // blocked pairs must equal all-pairs hamming over simHash64(shingles)
    val fp = corpus
      .select($"doc_id", HashFunctions.simHash64(TextFunctions.shingles($"text", 3)).as("sim"),
        size(TextFunctions.shingles($"text", 3)).as("nf"))
      .filter($"nf" > 0)
    val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        bit_count($"a.sim".bitwiseXOR($"b.sim")).cast("int").as("h"))
      .filter($"h" <= 3)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    val blocked = Dedup.simHashPairs(corpus, "doc_id", "text", shingleN = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked == brute)

    // an exact duplicate pair is hamming 0 under any feature basis; docs
    // too short to shingle get NO signature (they must not all collide on
    // the empty-feature fingerprint 0, which word-feature simhash never
    // produces but shingle features would)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "hi"), (4L, "yo")).toDF("doc_id", "text")
    val out = Dedup.simHashPairs(docs, "doc_id", "text", shingleN = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 0)))
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

  test("simhash degenerate corpus: every pair found, pair generation streams") {
    // 200 identical docs land in ONE bucket per chunk pair - the
    // boilerplate-corpus worst case. All C(200,2) pairs must come back
    // (round-2's cap bug dropped pairs here), and the plan must build
    // them via a streaming join, not a per-bucket collect_list array
    // (which would materialize C(B,2) structs in a single row).
    val dup = (0 until 200).map(i => (i.toLong, "same text again and again here"))
      .toDF("doc_id", "text")
    // disable auto-broadcast: at scale neither side fits in a broadcast,
    // so the plan we must certify is the sort-merge (spillable) one
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // ...and pin AQE's shuffled-hash rewrite off for the assertion: at
    // scale the maps exceed its 64 MB bound and the plan IS sort-merge;
    // this toy corpus would rewrite and certify the wrong plan
    val shj = spark.conf.get(
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
    try {
      val pairs = Dedup.simHashPairs(dup, "doc_id", "text")
      assert(pairs.count() == 199 * 200 / 2)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("collect_list"), "simhash pair generation must stream")
      assert(plan.contains("SortMergeJoin"), s"expected a streaming self-join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", shj)
    }
  }

  test("simhash hamming<=4 is supported by pair blocking (>=2 of 6 chunks agree)") {
    // two docs whose fingerprints differ in exactly 4 bits, one per chunk:
    // single-chunk agreement fails for 4 of 6 chunks but >=1 chunk PAIR
    // still agrees, so blocking must find the pair at maxHamming=4.
    val fp = corpus.select($"doc_id",
      HashFunctions.simHash64(TextFunctions.tokens($"text")).as("sim"))
    val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        bit_count($"a.sim".bitwiseXOR($"b.sim")).cast("int").as("h"))
      .filter($"h" <= 4)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    val blocked = Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked == brute)
    assertThrows[IllegalArgumentException] {
      Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 5)
    }
  }

  test("simhash covering designs are lossless per hamming tier (3/6/15 keys)") {
    // each maxHamming tier uses a different (smaller) chunk-pair covering
    // design; all of them must reproduce brute force exactly
    val fp = corpus.select($"doc_id",
      HashFunctions.simHash64(TextFunctions.tokens($"text")).as("sim"))
    for (h <- Seq(1, 2, 3)) {
      val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id", $"b.doc_id",
          bit_count($"a.sim".bitwiseXOR($"b.sim")).cast("int").as("h"))
        .filter($"h" <= h)
        .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
      val blocked = Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = h)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(blocked == brute, s"maxHamming=$h covering design dropped pairs")
    }
  }

  test("LSH embedding near-dup: full recall on a clustered corpus, zero false positives") {
    // A corpus with planted near-dup clusters (cos >= ~0.95 within, ~0 across):
    // the regime real duplicate detection runs in. Per-pair miss probability
    // at cos 0.9 with the default (6 bits, 20 tables) is (1-0.399)^20 = 4e-5,
    // and everything is deterministic (fixed hyperplanes), so LSH must
    // reproduce brute force EXACTLY here.
    val rnd = new Random(11)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val dim = 64
    val clustered = (0 until 20).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until 3).map { m =>
        val noisy = base.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
        ((c * 3 + m).toLong, unit(noisy).toSeq)
      }
    }
    val background = (0 until 100).map { i =>
      (1000L + i, unit(Array.fill(dim)(rnd.nextGaussian().toFloat)).toSeq)
    }
    val emb = (clustered ++ background).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

    val brute = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupLshPairs(emb, "vec_id", "embedding", 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.size >= 40, s"corpus must contain planted pairs, got ${brute.size}")
    assert(lsh == brute, "LSH must find every clustered pair and nothing else")

    val gate = Dedup.embeddingNearDupGate(emb, "vec_id", "embedding", 0.7,
      sampleIds = 2000, floor = 0.99)
      .as[(Long, Boolean, Long)].collect().head
    assert(gate == ((brute.size.toLong, true, 0L)))
  }

  test("connected components match a union-find reference on a random graph") {
    val rnd = new Random(31)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    // union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
      .map { case (id, root) => // canonical = min member id of the component
        id -> parent.keys.filter(find(_) == find(id)).min
      }
    val got = Dedup.connectedComponents(
      edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("components converge on a long chain (pointer jumping) and survivors keep one per cluster") {
    // a 200-long chain: plain one-hop propagation needs 200 rounds, far
    // over the 50-round budget - converging at all proves the pointer
    // jump's path doubling works (log2(200) ~ 8 rounds)
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(chain, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(comp.size == 201 && comp.values.forall(_ == 0L))

    // survivors: two clusters {1,2,3} and {10,11}, plus untouched 50
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.nearDupSurvivors(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 50L))
  }

  test("driver-local components equal the distributed fixpoint label-for-label") {
    // chains + clumps + self-contained triangles across a scattered id
    // space: the local union-find (the small-graph fast path) must match
    // the iterative min-label/pointer-jumping loop exactly
    val pairs = ((0L until 60L).map(i => (i * 7, i * 7 + 7)) ++      // long chain
      (100L until 120L).flatMap(i => Seq((1000L, i), (i, 2000L))) ++ // star clumps
      Seq((5000L, 5001L), (5001L, 5002L), (5002L, 5000L))            // triangle
      ).toDF("id_a", "id_b")
    val viaLocal = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val edges = pairs
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      .union(pairs.select(col("id_b").cast("long").as("a"), col("id_a").cast("long").as("b")))
      .distinct().localCheckpoint()
    val viaIterative = Dedup.iterativeComponents(edges, 50)
      .as[(Long, Long)].collect().toMap
    assert(viaLocal == viaIterative)
  }

  test("components of an empty pair set: empty result, survivors keep everything") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0)
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Dedup.nearDupSurvivors(docs, "doc_id", empty).count() == 2)
  }

  test("incremental exact dedup: delta vs a base digest index") {
    import spark.implicits._
    val base = Seq((1L, "The cat"), (2L, "a  DOG ")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the cat"),   // dup of base 1 (normalization) -> dropped
      (11L, "new text"),  // genuinely new
      (12L, "New  TEXT"), // dup WITHIN delta of 11 -> collapsed
      (13L, "a dog"),     // dup of base 2 -> dropped
      (14L, "another"))   // new
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .incrementalExact(delta, "doc_id", "text",
        graft.operators.Dedup.digests(base, "text"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((11L, 2L), (14L, 1L)))
  }

  test("contamination: full copy flagged, partial overlap below threshold not") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // superset of test 100
      (2L, "one two three four five six"),             // disjoint
      (3L, "p q r s t u v w"))                         // partial vs test 102
      .toDF("doc_id", "text")
    val test = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // all 2 of its 5-grams in train 1
      (101L, "totally different words here now folks"),
      (102L, "p q r s t xx yy zz aa bb"),            // 1/6 grams hit -> below 0.8
      (103L, "too short"))                           // <5 tokens: no grams, excluded
      .toDF("doc_id", "text")
    val out = graft.operators.Contamination
      .pairs(train, test, "doc_id", "text", n = 5, minFrac = 0.8)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((100L, 1L, 2L, 1.0)))
  }

  test("tfidf cosine pairs: identical docs hit 1.0, disjoint docs never pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),  // exact copy -> cosine 1.0
      (3L, "one two three four"),      // disjoint from 1/2
      (4L, "alpha beta xx yy"))        // partial overlap, below 0.9
      .toDF("doc_id", "text")
    val out = graft.operators.TfidfSim
      .cosinePairs(docs, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 1.0)))
    // lower threshold picks up the partial pair, still never the disjoint one
    val loose = graft.operators.TfidfSim
      .cosinePairs(docs, "doc_id", "text", threshold = 0.1)
      .as[(Long, Long, Double)].collect()
    assert(loose.exists(p => p._1 == 1L && p._2 == 4L))
    assert(!loose.exists(p => p._2 == 3L || p._1 == 3L))

    // blocking: the same corpus with docs 1/2 in different blocks never
    // pairs them; within-block pairs and scores are unchanged
    val blocked = docs.withColumn("src",
      when($"doc_id" === 2L, "other").otherwise("main"))
    val bp = graft.operators.TfidfSim
      .cosinePairs(blocked, "doc_id", "text", threshold = 0.1,
        blockCol = Some("src"))
      .as[(Long, Long, Double)].collect()
    assert(!bp.exists(p => p._1 == 1L && p._2 == 2L))
    assert(bp.exists(p => p._1 == 1L && p._2 == 4L)) // same block, still found
  }

  test("incremental near-dup: index-only base, keep-first delta, grown index") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-nd").toString
    Seq((0L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text").write.parquet(s"$root/base")
    val base = spark.read.parquet(s"$root/base")

    // materialized index = what a real ingest persists between runs
    val built = Dedup.nearDupIndex(base, "doc_id", "text")
    val index = Dedup.NearDupIndex(
      built.bands.localCheckpoint(), built.shingles.localCheckpoint())

    val delta = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // = base -> drop
      (3L, "completely different words forming unique content here for testing"),
      (5L, "completely different words forming unique content here for testing"), // = 3 -> drop (keep-first)
      (7L, "xy zz")) // shingle-less: no evidence, survives
      .toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDup(delta, "doc_id", "text", index)
    assert(inc.survivors.as[Long].collect().toSet == Set(3L, 7L))

    // a RE-DELIVERED id (already in the index, new ingest run) matches
    // itself at jaccard 1 and is dropped — the dedup contract; the
    // self-pair appears in hits (monitors that only COUNT relationships
    // filter it out themselves, StreamDedupStats.applyBatch)
    val replay = Seq((0L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    assert(Dedup.incrementalNearDup(replay, "doc_id", "text", index)
      .survivors.as[Long].collect().isEmpty)

    // the base corpus participates ONLY via the index: no scan of the
    // base parquet anywhere in the executed plan
    val plan = inc.survivors.queryExecution.executedPlan.toString
    assert(!plan.contains(root), "base text was re-read:\n" + plan)

    // the grown index carries exactly base + surviving delta docs
    assert(inc.index.shingles.select("id").as[Long].collect().toSet == Set(0L, 3L))

    // next delta dedups against a delta-1 survivor through the grown index
    val delta2 = Seq(
      (9L, "completely different words forming unique content here for testing"), // = 3 -> drop
      (11L, "fresh unseen material with no overlap at all anywhere else"))
      .toDF("doc_id", "text")
    val inc2 = Dedup.incrementalNearDup(delta2, "doc_id", "text", inc.index)
    assert(inc2.survivors.as[Long].collect().toSet == Set(11L))
  }

  test("tfidf degenerate hot block: chunked candgen = unchunked = naive") {
    import spark.implicits._
    // one block holds 80% of the docs, tiny shared vocabulary — the shape
    // that made single-column blocking quadratic-in-one-task. A small
    // maxPostings forces the chunk-triangle join (hot-term guard) through
    // chunks > 1; the result must be IDENTICAL to the unchunked join and
    // to a driver-side naive all-pairs tf-idf cosine.
    val vocab = Array("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8", "w9")
    def text(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until 20).map(_ => vocab(r.nextInt(vocab.length))).mkString(" ")
    }
    val docs = (0 until 50).map(i =>
      (i.toLong, text(i), if (i < 40) "hot" else "cold")).toDF("doc_id", "text", "src")
    val threshold = 0.8

    val chunked = graft.operators.TfidfSim
      .cosinePairs(docs, "doc_id", "text", threshold, Some("src"), maxPostings = 4)
      .as[(Long, Long, Double)].collect().toSet
    val unchunked = graft.operators.TfidfSim
      .cosinePairs(docs, "doc_id", "text", threshold, Some("src"), maxPostings = 1 << 30)
      .as[(Long, Long, Double)].collect().toSet
    assert(chunked == unchunked)

    // driver-side naive reference: same tf-idf formula, double math,
    // 6-dp quantized LONG dot — byte-identical semantics to the operator
    val rows = docs.as[(Long, String, String)].collect()
    val tf = rows.map { case (id, t, s) =>
      (id, s, t.split(" ").filter(_.nonEmpty).groupBy(identity).map { case (k, v) => k -> v.length.toDouble }) }
    val dfm = tf.flatMap(_._3.keys).groupBy(identity).map { case (k, v) => k -> v.length.toDouble }
    val nDocs = rows.length.toDouble
    val wn = tf.map { case (id, s, m) =>
      val w = m.map { case (t, f) => t -> f * (math.log((nDocs + 1) / (dfm(t) + 1)) + 1) }
      val norm = math.sqrt(w.values.map(x => x * x).sum)
      (id, s, w.map { case (t, x) => t -> math.round(x / norm * 1e6) })
    }
    val naive = (for {
      (ia, sa, wa) <- wn; (ib, sb, wb) <- wn
      if ia < ib && sa == sb
      dot = wa.keysIterator.filter(wb.contains).map(t => wa(t) * wb(t)).sum
      cos = math.rint(dot.toDouble / 1e12 * 1e4) / 1e4
      if cos >= threshold
    } yield (ia, ib, cos)).toSet
    assert(chunked == naive)
    assert(naive.nonEmpty) // the test must be discriminating
    // cross-block pairs never appear
    assert(chunked.forall { case (a, b, _) => (a < 40) == (b < 40) })
  }

  test("hot-bucket cap bounds candidate generation") {
    // 30 identical docs: uncapped LSH would emit 435 pairs; cap=5 keeps
    // the 5 lowest ids per bucket -> C(5,2) = 10 pairs.
    val dup = (0 until 30).map(i => (i.toLong, "same text again and again here")).toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(dup, "doc_id", "text", bucketCap = 5)
    assert(pairs.count() == 10)
  }
}
