package graft

import graft.operators.SnapshotDiff
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.col

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, Option("alpha")), (2L, Option("beta")), (3L, Option("gamma")),
    (4L, Option.empty[String]))
    .toDF("doc_id", "text")
  private val newSnap = Seq(
    (1L, Option("alpha")),       // unchanged -> absent from the diff
    (2L, Option("beta prime")),  // changed
    (4L, Option("")),            // NULL -> '' digests equal: unchanged
    (5L, Option("delta")))       // added; 3 removed
    .toDF("doc_id", "text")

  test("emits churn only, classified added/removed/changed") {
    val out = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", Seq("text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((2L, "changed"), (3L, "removed"), (5L, "added")))
  }

  test("content never rides the shuffle: only id and digest move") {
    // tiny frames would broadcast (BNLJ supports full outer); force the
    // at-scale shuffled SMJ shape, and switch AQE off so the Exchange
    // nodes are plain children (collectable) rather than AQE-wrapped
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", Seq("text"))
        .queryExecution.executedPlan
      val shuffled = plan.collect { case s: ShuffleExchangeExec => s.child.output.map(_.name) }
      assert(shuffled.nonEmpty, s"expected a shuffled join:\n$plan")
      shuffled.foreach(cols =>
        assert(!cols.contains("text"), s"text shuffled: $shuffled"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("multi-column digest catches a change in any content column") {
    val o = Seq((1L, "a", "x")).toDF("doc_id", "text", "lang")
    val n = Seq((1L, "a", "y")).toDF("doc_id", "text", "lang")
    val out = SnapshotDiff.diff(o, n, "doc_id", Seq("text", "lang"))
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "changed")))
    val same = SnapshotDiff.diff(o, o.filter(col("doc_id") === 1), "doc_id", Seq("text", "lang"))
      .collect()
    assert(same.isEmpty)
  }
}
