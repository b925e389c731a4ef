package graft

import java.nio.file.Files

import graft.pipelines.{Dag, TweetsAndMarketDag}

class DagSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDay(root: String): Unit = {
    val dayDir = new java.io.File(s"$root/in/2020/01/21"); dayDir.mkdirs()
    val gz = new java.io.PrintStream(
      new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$dayDir/part-0.jsonl.gz")))
    gz.println("""{"full_text": "fast fast slow", "lang": "en"}""")
    gz.println("""{"full_text": "slow big join", "lang": "en"}""")
    gz.println("""{"full_text": "nothing here", "lang": "en"}""")
    gz.close()
  }

  test("dag primitives: order, retry, gate, skip-downstream, cycle") {
    // retry: fails once, then succeeds
    var attempts = 0
    val flaky = Dag.Task("flaky", () => {
      attempts += 1
      if (attempts < 2) throw new RuntimeException("transient")
    }, retries = 2)
    var ran = List.empty[String]
    def note(id: String) = Dag.Task(id, () => { ran ::= id })
    val out = Dag.run(
      Seq(note("a"), flaky, note("b"), Dag.Task("gated", () => (), gate = () => false), note("c")),
      Seq("a" -> "flaky", "flaky" -> "b", "a" -> "gated", "gated" -> "c"))
    val byId = out.map(o => o.id -> o).toMap
    assert(byId("flaky").status == Dag.Succeeded && byId("flaky").attempts == 2)
    assert(byId("b").status == Dag.Succeeded)
    // gate failure is terminal (1 attempt, no retry) and skips downstream
    assert(byId("gated").status == Dag.Failed && byId("gated").attempts == 1)
    assert(byId("c").status == Dag.Skipped && !ran.contains("c"))
    // execution order respects edges
    assert(out.map(_.id).indexOf("a") < out.map(_.id).indexOf("flaky"))

    // permanent failure exhausts retries
    val dead = Dag.run(Seq(Dag.Task("d", () => throw new RuntimeException("x"), retries = 1)), Nil)
    assert(dead.head.status == Dag.Failed && dead.head.attempts == 2)

    intercept[IllegalArgumentException] {
      Dag.run(Seq(note("x"), note("y")), Seq("x" -> "y", "y" -> "x"))
    }
    intercept[IllegalArgumentException] {
      Dag.run(Seq(note("x")), Seq("x" -> "nope"))
    }
  }

  test("tweets_and_market dag: both branches ordered, all green, idempotent") {
    val root = Files.createTempDirectory("graft-dag").toString
    writeDay(root)
    val feed = Seq(("NASDAQ100", Some(9083.0)), ("DAX", Some(13555.0)))
      .toDF("index", "value")
    val b = TweetsAndMarketDag.build(spark, s"$root/in", s"$root/out", feed, 2020, 1, 21)

    val out = Dag.run(b.tasks, b.edges)
    assert(out.forall(_.status == Dag.Succeeded), out.mkString("; "))
    val order = out.map(_.id)
    assert(order.head == "start" && order.last == "finish")
    assert(order.indexOf("scrap_market_data") < order.indexOf("market_data_quality_check"))
    assert(order.indexOf("analyse_tweets_sentiment") < order.indexOf("insert_tweets_sentiment"))
    assert(order.indexOf("insert_tweets_sentiment") <
      order.indexOf("tweets_sentiment_data_quality_check"))

    val m1 = spark.read.parquet(b.marketPath).orderBy("markets_value_id").collect().toSeq
    val s1 = spark.read.parquet(b.sentimentPath).collect().toSeq
    assert(m1.size == 2 && s1.size == 1)

    // re-run converges to identical warehouse state (no dup rows)
    val again = Dag.run(b.tasks, b.edges)
    assert(again.forall(_.status == Dag.Succeeded))
    assert(spark.read.parquet(b.marketPath).orderBy("markets_value_id").collect().toSeq == m1)
    assert(spark.read.parquet(b.sentimentPath).collect().toSeq == s1)
  }

  test("tweets_and_market dag: failed market gate blocks finish, not tweets") {
    val root = Files.createTempDirectory("graft-dag-fail").toString
    writeDay(root)
    val emptyFeed = Seq.empty[(String, Option[Double])].toDF("index", "value")
    val b = TweetsAndMarketDag.build(spark, s"$root/in", s"$root/out", emptyFeed, 2020, 1, 21)

    val byId = Dag.run(b.tasks, b.edges).map(o => o.id -> o).toMap
    assert(byId("market_data_quality_check").status == Dag.Failed)
    assert(byId("finish").status == Dag.Skipped)
    // the tweets branch is untouched by the market failure
    assert(byId("analyse_tweets_sentiment").status == Dag.Succeeded)
    assert(byId("tweets_sentiment_data_quality_check").status == Dag.Succeeded)
    assert(spark.read.parquet(b.sentimentPath).count() == 1)
  }
}
