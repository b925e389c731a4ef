package graft

import graft.operators.Merge
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def base =
    Seq((1L, "A", 0L), (2L, "B", 0L), (3L, "C", 0L)).toDF("k", "attr", "version")

  test("upsert: update beats base, latest update wins, new keys insert") {
    // key 2 updated, key 3 updated twice (v1 then v2), key 4 is an insert
    val updates = Seq(
      (2L, "B2", 1L), (3L, "C1", 1L), (3L, "C2", 2L), (4L, "D", 1L))
      .toDF("k", "attr", "version")
    val out = Merge.upsert(base, updates, Seq("k"), "version")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set(
      (1L, "A", 0L), (2L, "B2", 1L), (3L, "C2", 2L), (4L, "D", 1L)))
  }

  test("upsert: update at the SAME version replaces the base row") {
    val updates = Seq((1L, "A'", 0L)).toDF("k", "attr", "version")
    val out = Merge.upsert(base, updates, Seq("k"), "version")
      .as[(Long, String, Long)].collect().toSet
    assert(out.contains((1L, "A'", 0L)) && out.size == 3)
  }

  test("upsert: empty updates is the identity") {
    val out = Merge.upsert(base, base.limit(0), Seq("k"), "version")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "A", 0L), (2L, "B", 0L), (3L, "C", 0L)))
  }

  test("upsertSmallUpdates is result-identical to upsert in the CDC regime") {
    val updates = Seq(
      (2L, "B2", 1L), (3L, "C1", 1L), (3L, "C2", 2L), (4L, "D", 1L))
      .toDF("k", "attr", "version")
    val a = Merge.upsert(base, updates, Seq("k"), "version")
      .as[(Long, String, Long)].collect().toSet
    val b = Merge.upsertSmallUpdates(base, updates, Seq("k"), "version")
      .as[(Long, String, Long)].collect().toSet
    assert(a == b)
  }

  test("upsertSmallUpdates: the big base side never shuffles") {
    val updates = Seq((2L, "B2", 1L)).toDF("k", "attr", "version")
    val plan = Merge.upsertSmallUpdates(base, updates, Seq("k"), "version")
      .queryExecution.executedPlan
    // the only shuffle allowed is the updates-side latest-per-key window;
    // the base side is a broadcast anti-join probe + union
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1, s"base side shuffled:\n$plan")
  }

  test("scdIntervals: hand-computed change log") {
    // user 1: x@1, x@2 (no change), y@3, x@5 -> (x,1,3),(y,3,5),(x,5,null)
    // user 2: single event -> one open interval
    val ev = Seq(
      (1L, 1L, 10L, "x"), (1L, 2L, 11L, "x"), (1L, 3L, 12L, "y"),
      (1L, 5L, 13L, "x"), (2L, 4L, 14L, "z"))
      .toDF("user_id", "us", "event_id", "event_type")
    val out = Merge.scdIntervals(ev, "user_id", "us", "event_id", "event_type")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, "x", 1L, Some(3L)), (1L, "y", 3L, Some(5L)), (1L, "x", 5L, None),
      (2L, "z", 4L, None)))
  }

  test("scdIntervals: same-timestamp events break ties on tieCol") {
    val ev = Seq((1L, 7L, 1L, "a"), (1L, 7L, 2L, "b"))
      .toDF("user_id", "us", "event_id", "event_type")
    val out = Merge.scdIntervals(ev, "user_id", "us", "event_id", "event_type")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(out == Set((1L, "a", 7L, Some(7L)), (1L, "b", 7L, None)))
  }

  test("scdIntervals: both windows share one Exchange") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ev = Seq((1L, 1L, 1L, "x")).toDF("user_id", "us", "event_id", "event_type")
      val plan = Merge.scdIntervals(ev, "user_id", "us", "event_id", "event_type")
        .queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size == 1, s"expected one Exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
