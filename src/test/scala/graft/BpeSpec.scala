package graft

import graft.functions.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("trainer learns the textbook merges; greedy apply follows rank order") {
    // the classic BPE example (Sennrich et al. shape): character pairs
    // shared by frequent words merge first, weighted by word counts
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainMerges(counts, 6)
    // pair frequencies round 1: (l,o) 7, (o,w) 7, (e,s) 9, (s,t) 9,
    // (w,e) 8, ... -> (e,s) wins (count 9, lexicographic beats (s,t));
    // then (es,t) 9, then (l,o) 7 beats (o,w)? after merges: (l,o)=7,
    // (o,w)=7 -> (l,o) lexicographically first
    assert(merges.take(4) == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))

    val ranks = merges.zipWithIndex.toMap
    // apply is rank-greedy, not left-to-right: "lowest" fuses est before low
    assert(Bpe.segmentWord("lowest", ranks) == Vector("low", "est"))
    assert(Bpe.segmentWord("low", ranks) == Vector("low"))
    // unseen symbols survive as singletons; concatenation always rebuilds
    for (w <- Seq("lowest", "slowest", "xyz", "newlow", ""))
      assert(Bpe.segmentWord(w, ranks).mkString == w)
    // more merges never increase a word's token count
    val fewer = Bpe.segmentWord("newest", merges.take(2).zipWithIndex.toMap).size
    assert(Bpe.segmentWord("newest", ranks).size <= fewer)
  }

  test("q76b's pinned DemoMerges: multi-level fuse order is the one the oracle replays") {
    val ranks = Bpe.DemoMerges.zipWithIndex.toMap
    // two-level: t+h (rank 0) fuses before th+e (rank 1) can exist
    assert(Bpe.segmentWord("the", ranks) == Vector("the"))
    // an+d needs a+n (rank 3) first
    assert(Bpe.segmentWord("and", ranks) == Vector("and"))
    // rank order decides between competing pairs: in "north", o+n (rank 5)
    // would block n+o... but only (o,n),(o,r),(t,h) apply: o+r wins? no —
    // adjacent pairs are (n,o),(o,r),(r,t),(t,h): t+h rank 0 first, then
    // o+r rank 8 -> [n, or, th]
    assert(Bpe.segmentWord("north", ranks) == Vector("n", "or", "th"))
    // roundtrip on every demo-merge symbol
    for (w <- Seq("the", "and", "north", "interesting", "zzz", ""))
      assert(Bpe.segmentWord(w, ranks).mkString == w)
  }

  test("vocab-dictionary join equals direct per-occurrence segmentation") {
    val docs = Seq(
      (1L, "low lower newest"),
      (2L, "newest newest widest"),
      (3L, "low")).toDF("doc_id", "text")
    val merges = Bpe.trainFromCorpus(docs, "text", k = 4)
    val ranks = merges.zipWithIndex.toMap
    val full = Bpe.tokenCounts(spark, docs, "doc_id", "text", merges)
    // in-query self-gates: segmentation round-trips, the dictionary join
    // lost nothing, and no word compressed below one token
    assert(full.columns.toSeq ==
      Seq("doc_id", "n_tokens", "n_bpe_tokens", "roundtrip_ok", "join_ok", "fertility_ok"))
    assert(full.filter(!$"roundtrip_ok" || !$"join_ok" || !$"fertility_ok").count() == 0)
    val out = full.select("doc_id", "n_tokens", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // reference: segment every occurrence directly on the driver
    val expected = Seq(
      (1L, "low lower newest"), (2L, "newest newest widest"), (3L, "low"))
      .map { case (id, t) =>
        val toks = t.split(" ").toSeq
        (id, toks.size.toLong, toks.map(w => Bpe.segmentWord(w, ranks).size.toLong).sum)
      }
    assert(out == expected)
    // BPE compresses below character count and never below word count
    out.zip(expected).foreach { case ((_, n, b), _) =>
      assert(b >= n, "a word is at least one BPE token") }
  }

  test("fertility: char-level without merges; the fitted slice beats the alien slice") {
    val docs = Seq(
      (1L, "low low lower", "fit"), (2L, "low lowest", "fit"),
      (3L, "zzq qqz zqq", "alien"))
      .toDF("doc_id", "text", "source")
    // no merges -> every word splits to characters: fertility == chars/words
    val noneDf = Bpe.fertility(spark, docs, "doc_id", "text", "source", Seq.empty)
    assert(noneDf.columns.toSeq == Seq("slice", "n_docs", "n_words",
      "n_bpe_tokens", "fertility", "roundtrip_ok", "fertility_ok"))
    assert(noneDf.filter(!$"roundtrip_ok" || !$"fertility_ok").count() == 0)
    val none = noneDf
      .select("slice", "n_docs", "n_words", "n_bpe_tokens", "fertility")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(none("fit") == (("fit", 2L, 5L, 20L, 4.0)))
    assert(none("alien") == (("alien", 1L, 3L, 9L, 3.0)))
    // merges trained on the corpus compress the slice they fit
    val merges = Bpe.trainFromCorpus(docs, "text", k = 6)
    val fert = Bpe.fertility(spark, docs, "doc_id", "text", "source", merges)
      .select("slice", "n_docs", "n_words", "n_bpe_tokens", "fertility")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(fert("fit") < none("fit")._5, s"$fert")
  }
}
