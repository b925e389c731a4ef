package graft

import java.sql.Timestamp
import graft.operators.Funnel

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def t(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("order matters: a purchase before the first view does not convert") {
    val events = Seq(
      // user 1, one session: full ordered funnel
      (1L, 10L, t(0), "view"), (1L, 11L, t(1), "click"), (1L, 12L, t(2), "purchase"),
      // user 2: purchase BEFORE view -> reaches view only
      (2L, 20L, t(0), "purchase"), (2L, 21L, t(1), "view"),
      // user 3: view then click in session 1; purchase in a NEW session
      // (gap > 30 min) -> purchase does not count
      (3L, 30L, t(0), "view"), (3L, 31L, t(1), "click"), (3L, 32L, t(90), "purchase"),
      // user 4: clicks only -> no step reached
      (4L, 40L, t(0), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.sessionFunnel(events)
      .as[(Int, String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // sessions: u1×1, u2×1, u3×2, u4×1 = 5
    assert(out.map(r => (r._1, r._2, r._3, r._4)) == Seq(
      (1, "view", 5L, 3L), (2, "click", 5L, 2L), (3, "purchase", 5L, 1L)))
    assert(out.map(_._5) == Seq(0.6, 0.4, 0.2))
    assert(out(1)._6 == 0.6667) // 2/3 of viewing sessions clicked
    assert(out(2)._6 == 0.5)    // 1/2 of clicking sessions purchased
  }

  test("retention: cohort = first active day, offsets count distinct-day activity") {
    def day(d: Int, min: Long) = new Timestamp(d * 86400000L + min * 60000L)
    val events = Seq(
      // users 1,2 start day 0; user 1 returns day 1 (twice — counts once)
      (1L, 1L, day(0, 1), "view"), (2L, 2L, day(0, 2), "view"),
      (1L, 3L, day(1, 1), "view"), (1L, 4L, day(1, 2), "click"),
      // user 3 starts day 1, returns day 2
      (3L, 5L, day(1, 0), "view"), (3L, 6L, day(2, 0), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.retentionCohorts(events)
      .as[(java.sql.Date, Int, Long, Long, Double)].collect()
      .map(r => (r._1.toString, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out == Map(
      ("1970-01-01", 0) -> ((2L, 2L, 1.0)),
      ("1970-01-01", 1) -> ((1L, 2L, 0.5)),
      ("1970-01-02", 0) -> ((1L, 1L, 1.0)),
      ("1970-01-02", 1) -> ((1L, 1L, 1.0))))
  }

  test("same-timestamp progression counts (>= boundary)") {
    val events = Seq(
      (1L, 1L, t(0), "view"), (1L, 2L, t(0), "click"), (1L, 3L, t(0), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.sessionFunnel(events)
      .as[(Int, String, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._4).toSeq == Seq(1L, 1L, 1L))
  }
}
