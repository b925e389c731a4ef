package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).getAs[T]("v")

  test("fingerprint matches a direct Scala reference implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * TextFunctions.FpBase + c.toLong) % TextFunctions.FpMod)
    for (s <- Seq("the fast join", "a", "", "spark group query row data"))
      assert(one[Long](TextFunctions.fingerprint(col("text")), s) == ref(s), s"text=$s")
  }

  test("PII scrub redacts emails and URLs and counts each span") {
    val cases = Seq(
      ("mail bob.smith+x@sub.example.co.uk end", "mail <EMAIL> end", 1L, 0L),
      ("go to https://a.example.org/p_q-r/x.html now", "go to <URL> now", 0L, 1L),
      ("u@a.io and http://b.io/z", "<EMAIL> and <URL>", 1L, 1L),
      ("no pii at all", "no pii at all", 0L, 0L),
      ("two u@a.io v@b.io", "two <EMAIL> <EMAIL>", 2L, 0L))
    for ((in, want, ne, nu) <- cases) {
      assert(one[String](TextFunctions.scrubPii(col("text")), in) == want, s"in=$in")
      assert(one[Long](TextFunctions.emailCount(col("text")), in) == ne, s"in=$in")
      assert(one[Long](TextFunctions.urlCount(col("text")), in) == nu, s"in=$in")
    }
  }

  test("sentiment majority vote is tri-state") {
    assert(one[String](TextFunctions.overallSentiment(col("text")), "fast fast slow") == "positive")
    assert(one[String](TextFunctions.overallSentiment(col("text")), "slow big fast") == "negative")
    assert(one[String](TextFunctions.overallSentiment(col("text")), "fast slow") == "na")
    assert(one[String](TextFunctions.overallSentiment(col("text")), "nothing here") == "na")
  }

  test("lexicons are pluggable: AFINN-format load, both scoring paths agree") {
    import graft.functions.Lexicon
    // loader: tab format, comments, phrases, negative valences
    val lex = Lexicon.fromResource("afinn-sample.txt")
    assert(lex.size == 6)
    assert(lex.scores("outstanding") == 5 && lex.scores("can't stand") == -3)
    assert(lex.positive == Seq("breathtaking", "fast", "outstanding"))
    assert(lex.negative == Seq("abandon", "can't stand", "slow"))
    intercept[IllegalArgumentException](Lexicon.fromLines(Iterator("no tabs here")))

    // a loaded lexicon changes scoring: "breathtaking" is unknown to Toy
    assert(one[String](
      TextFunctions.overallSentiment(col("text"), lex), "breathtaking stuff") == "positive")
    assert(one[String](
      TextFunctions.overallSentiment(col("text")), "breathtaking stuff") == "na")

    // broadcast-join path (the big-lexicon shape) == column path, per doc
    val docs = Seq(
      (1L, "fast fast slow"), (2L, "slow big join"), (3L, "nothing here"),
      (4L, ""), (5L, "abandon outstanding outstanding")).toDF("doc_id", "text")
    for (l <- Seq(Lexicon.Toy, lex)) {
      val colPath = docs.select($"doc_id",
        TextFunctions.overallSentiment($"text", l).as("sentiment"))
        .as[(Long, String)].collect().toMap
      val joinPath = TextFunctions.sentimentJoined(docs, "doc_id", "text", l)
        .as[(Long, String)].collect().toMap
      assert(joinPath == colPath, s"paths diverge for lexicon of size ${l.size}")
    }
    // and the join path's plan actually broadcasts the lexicon
    val plan = TextFunctions.sentimentJoined(docs, "doc_id", "text", lex)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("token counts: whitespace vs regex") {
    assert(one[Long](TextFunctions.tokenCount(col("text")), "a b c") == 3L)
    assert(one[Long](TextFunctions.regexTokenCount(col("text")), "ab12cd, x") == 5L)
  }

  test("langId flags stopword-bearing text as en") {
    assert(one[String](TextFunctions.langId(col("text")), "the quick fox") == "en")
    assert(one[String](TextFunctions.langId(col("text")), "quick fox") == "und")
  }

  test("native shingleSet matches the HOF reference on varied texts") {
    val texts = Seq(
      "a b c d e", "a a a a", "x", "", "one two three", "a b a b a b",
      "  leading", "double  space inside", "trail ")
    val df = texts.toDF("text")
    val got = df.select(TextFunctions.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect().toSeq
    val ref = df.select(TextFunctions.shinglesReference(col("text"), 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got == ref, s"texts=$texts")
  }

  test("jaccard of shingle arrays") {
    val df = Seq(("x y z w", "y z w v")).toDF("a", "b")
    val j = df.select(TextFunctions.jaccard(
      TextFunctions.shingles(col("a"), 2), TextFunctions.shingles(col("b"), 2)).as("j"))
      .collect()(0).getDouble(0)
    // a-shingles {x y, y z, z w}, b-shingles {y z, z w, w v}: 2 / 4
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("sentiment model: batch scoring = driver reference; lexicon model = column path") {
    import graft.functions.{Lexicon, SentimentModel}
    // real-valued weights + bias + dead zone — beyond what the lexicon does
    val model = SentimentModel(
      Map("good" -> 1.5, "great" -> 2.0, "bad" -> -1.0, "awful" -> -2.5),
      bias = 0.25, deadZone = 0.5)
    val r = new scala.util.Random(42)
    val vocab = Array("good", "great", "bad", "awful", "meh", "thing", "x")
    val docs = (0 until 200).map(i =>
      (i.toLong, (0 until r.nextInt(12)).map(_ => vocab(r.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")

    val scored = SentimentModel.scored(docs, "doc_id", "text", model, batchSize = 7)
      .as[(Long, Double, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val reference = docs.as[(Long, String)].collect().map { case (id, text) =>
      val m = model.margin(text.split(" ").toSeq)
      id -> ((m, model.label(m)))
    }.toMap
    assert(scored.size == 200 && scored == reference)

    // the lexicon-as-model reproduces the overallSentiment column exactly
    val lexModel = SentimentModel.fromLexicon(Lexicon.Toy)
    val corpus = Seq(
      (1L, "fast fast slow"), (2L, "slow big join"), (3L, "nothing here"),
      (4L, "fast slow"), (5L, "")).toDF("doc_id", "text")
    val viaModel = SentimentModel.scored(corpus, "doc_id", "text", lexModel)
      .select("doc_id", "sentiment").as[(Long, String)].collect().toMap
    val viaColumn = corpus
      .select($"doc_id", graft.functions.TextFunctions.overallSentiment($"text").as("s"))
      .as[(Long, String)].collect().toMap
    assert(viaModel == viaColumn)

    // AFINN-style round trip
    val parsed = SentimentModel.fromLines(Iterator("# c", "good\t1.5", "awful\t-2.5"))
    assert(parsed.weights == Map("good" -> 1.5, "awful" -> -2.5))
  }
}
