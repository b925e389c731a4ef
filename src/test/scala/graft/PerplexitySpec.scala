package graft

import graft.operators.Perplexity

class PerplexitySpec extends SparkTestBase {
  import spark.implicits._

  test("bigram LM: driver-reference equality, normalization, OOV ordering") {
    val ref = Seq(
      (0L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("doc_id", "text")
    val lm = Perplexity.train(ref, "doc_id", "text")

    // conditional normalizes: Σ_w2-over-vocab (c12+1)/(c1+V) = 1 exactly
    // iff each prefix's bigram-count sum equals its prefix count
    val v = lm.vocab.as[Double].head()
    val c1 = lm.unigrams.as[(String, Long)].collect().toMap
    val c12 = lm.bigrams.as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    c1.foreach { case (w1, n) =>
      assert(c12(w1) == n,
        s"prefix $w1: Σ_w2 c12 = ${c12(w1)} must equal c1 = $n (normalization)")
    }

    // driver-side reference score for one doc
    val probe = Seq((1L, "the cat sat on the rug")).toDF("doc_id", "text")
    val out = Perplexity.score(probe, "doc_id", "text", lm)
      .as[(Long, Long, Double, Double)].head()
    val toks = "the cat sat on the rug".split(" ")
    val lnps = toks.sliding(2).map { case Array(a, b) =>
      math.log((c12ForPair(lm, a, b) + 1.0) / (c1.getOrElse(a, 0L) + v))
    }.toSeq
    val h = math.rint(-lnps.sum / lnps.size * 1e4) / 1e4
    assert(out._2 == 5L && out._3 == h)
    assert(out._4 == math.rint(math.exp(h) * 100) / 100)

    // OOV text scores strictly higher perplexity than in-domain text
    val pair = Seq(
      (1L, "the cat sat on the mat"),
      (3L, "zz qq ww ee rr tt")).toDF("doc_id", "text")
    val scored = Perplexity.score(pair, "doc_id", "text", lm)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(scored(3L) > scored(1L))

    // single-token docs carry no bigram evidence: excluded
    assert(Perplexity.score(
      Seq((9L, "word")).toDF("doc_id", "text"), "doc_id", "text", lm).count() == 0)
  }

  test("bands: per-source terciles, head = most fluent, sources independent") {
    val ref = Seq(
      (0L, "the cat sat on the mat and the dog sat on the rug"))
      .toDF("doc_id", "text")
    val lm = Perplexity.train(ref, "doc_id", "text")
    // source A: three docs of strictly increasing OOV-ness; source B: all
    // identical (every doc ties at the cut -> everyone lands in head)
    val docs = Seq(
      (1L, "the cat sat on the mat", "A"),      // in-domain
      (3L, "the cat sat zz qq ww", "A"),        // half OOV
      (5L, "zz qq ww ee rr tt", "A"),           // all OOV
      (7L, "the dog sat on the rug", "B"),
      (9L, "the dog sat on the rug", "B"),
      (11L, "the dog sat on the rug", "B")).toDF("doc_id", "text", "src")
    val out = Perplexity.bands(docs, "doc_id", "text", "src", lm)
      .as[(Long, String, Double, String)].collect().map(r => r._1 -> r._4).toMap
    assert(out(1L) == "head" && out(3L) == "middle" && out(5L) == "tail")
    // B's cuts come from B alone: identical ppls all tie at <= lo
    assert(out(7L) == "head" && out(9L) == "head" && out(11L) == "head")
  }

  test("bands approxCuts: scale path agrees with the exact twin; gate holds at 25-doc sources") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val lm = Perplexity.train(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
    val scoreSide = docs.filter(pmod(col("doc_id"), lit(2)) === 1)

    // the q70 gate: per-source sketch cuts inside the exact rank window
    val gate = Perplexity.bandCutGate(scoreSide, "doc_id", "text", "source", lm)
      .collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      assert(r.getAs[Boolean]("lo_ok") && r.getAs[Boolean]("hi_ok"),
        s"ppl sketch cut escaped the exact window: $r")
    }

    // band assignments: the approx path may flip only boundary docs — docs
    // whose ppl lies between the sketch's element cut and the exact
    // interpolated cut. Bound: ≤ 2 flips per source per cut (the same
    // ≥2-ranks-at-25-docs arithmetic as the window), observed 0 here.
    val exact = Perplexity.bands(scoreSide, "doc_id", "text", "source", lm)
      .select(col("doc_id"), col("band").as("b_exact"))
    val approx = Perplexity.bands(scoreSide, "doc_id", "text", "source", lm,
      approxCuts = true)
      .select(col("doc_id"), col("source"), col("band").as("b_approx"))
    val flips = approx.join(exact, "doc_id")
      .filter(col("b_exact") =!= col("b_approx"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect()
    flips.foreach { r =>
      assert(r.getAs[Long]("n") <= 4, s"too many band flips: $r")
    }
  }

  test("minCount pruning: model shrinks, default is exact, bands agree within tolerance") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val ref = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val scoreSide = docs.filter(pmod(col("doc_id"), lit(2)) === 1)

    // exact pruning semantics on a corpus with a known hapax tail
    val tiny = Seq(
      (0L, "a b a b a b"), // a-b x3, b-a x2
      (2L, "c d")          // c-d x1: the hapax to prune
    ).toDF("doc_id", "text")
    val tinyFull = Perplexity.train(tiny, "doc_id", "text")
    val tinyPruned = Perplexity.train(tiny, "doc_id", "text", minCount = 2)
    assert(tinyFull.bigrams.count() == 3 && tinyPruned.bigrams.count() == 2)
    assert(tinyPruned.bigrams.filter(col("w1") === "c").count() == 0)
    // prefix counts and vocabulary keep the full corpus mass: the pruned
    // bigram degrades to the unseen floor 1/(c1+V), not to a new model
    assert(tinyPruned.unigrams.count() == tinyFull.unigrams.count())
    assert(tinyPruned.vocab.as[Double].head() == tinyFull.vocab.as[Double].head())
    val probe = Seq((9L, "c d")).toDF("doc_id", "text")
    def ppl(lm: Perplexity.BigramLm): Double =
      Perplexity.score(probe, "doc_id", "text", lm)
        .select("ppl").as[Double].head()
    // V=4, c1(c)=1: unpruned ln((1+1)/(1+4)), pruned floor ln(1/(1+4))
    assert(ppl(tinyFull) == math.rint(math.exp(math.rint(
      -math.log(2.0 / 5.0) * 1e4) / 1e4) * 100) / 100)
    assert(ppl(tinyPruned) == math.rint(math.exp(math.rint(
      -math.log(1.0 / 5.0) * 1e4) / 1e4) * 100) / 100)
    assert(ppl(tinyPruned) > ppl(tinyFull))

    val full = Perplexity.train(ref, "doc_id", "text")
    val pruned = Perplexity.train(ref, "doc_id", "text", minCount = 2)
    // the repetitive synthetic table has a thin tail — assert direction,
    // not magnitude (open-domain corpora are where the knob pays)
    val nFull = full.bigrams.count()
    assert(pruned.bigrams.count() < nFull)

    // knob off = byte-identical model (q67/q68's oracle path untouched)
    assert(Perplexity.train(ref, "doc_id", "text", minCount = 1)
      .bigrams.count() == nFull)

    // documented tolerance: >= 90% of docs keep their band when scoring
    // under the pruned model (pruned entries fall to the smoothing floor,
    // shifting every doc's ppl the same direction — cuts shift with them)
    val bFull = Perplexity.bands(scoreSide, "doc_id", "text", "source", full)
      .select(col("doc_id"), col("band").as("b_full"))
    val bPruned = Perplexity.bands(scoreSide, "doc_id", "text", "source", pruned)
      .select(col("doc_id"), col("band").as("b_pruned"))
    val joined = bFull.join(bPruned, "doc_id")
    val n = joined.count()
    val same = joined.filter(col("b_full") === col("b_pruned")).count()
    assert(n > 0 && same.toDouble / n >= 0.9,
      s"pruned-model band agreement ${same.toDouble / n} below 0.9 ($same/$n)")
  }

  private def c12ForPair(lm: Perplexity.BigramLm, a: String, b: String): Long = {
    import org.apache.spark.sql.functions.col
    val r = lm.bigrams.filter(col("w1") === a && col("w2") === b)
      .select("c12").collect()
    if (r.isEmpty) 0L else r(0).getLong(0)
  }
}
