package graft

import java.sql.Timestamp

import graft.streaming.{EventStream, SessionEvent, SessionState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("EventStream tumbling window over MemoryStream matches batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = EventStream.tumblingCounts(events)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        (t(5), "click", 1.0), (t(15), "click", 2.0), (t(65), "view", 3.0),
        // late watermark push so the first windows finalize (wm = max - 2h)
        (t(300), "view", 0.0))
      q.processAllAvailable()
      input.addData((t(500), "view", 0.0)) // advance watermark past 05:00
      q.processAllAvailable()

      val got = spark.table("tumbling_test")
        .select($"window_start".cast("string"), $"event_type", $"n_events", $"total_value")
        .as[(String, String, Long, Double)].collect().toSet
      assert(got.contains(("2024-01-01 00:00:00", "click", 2L, 3.0)))
      assert(got.contains(("2024-01-01 01:00:00", "view", 1L, 3.0)))
    } finally q.stop()

    // batch twin over the same rows produces the same finalized windows
    val batch = EventStream.tumblingCounts(
      Seq((t(5), "click", 1.0), (t(15), "click", 2.0), (t(65), "view", 3.0))
        .toDF("ts", "event_type", "value"))
      .select($"window_start".cast("string"), $"event_type", $"n_events", $"total_value")
      .as[(String, String, Long, Double)].collect().toSet
    assert(batch == Set(
      ("2024-01-01 00:00:00", "click", 2L, 3.0),
      ("2024-01-01 01:00:00", "view", 1L, 3.0)))
  }

  test("StreamLoad: finalized windows land in a JDBC warehouse exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.{JdbcSink, SqlSink}
    val conn = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:graft_stream;create=true")
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStream.tumblingCounts(input.toDF().toDF("ts", "event_type", "value"))
    JdbcSink.run(conn, Seq(SqlSink.createTableSql(
      "windowed_counts", agg.schema, ifNotExists = false, varcharWidth = 64)))

    var batches = Vector.empty[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val q = graft.streaming.StreamLoad.toJdbc(
      agg, "windowed_counts",
      () => java.sql.DriverManager.getConnection("jdbc:derby:memory:graft_stream"),
      ckpt, onBatch = (id, n) => batches :+= (id, n))
    try {
      input.addData((t(5), "click", 1.0), (t(15), "click", 2.0), (t(65), "view", 3.0))
      q.processAllAvailable()
      input.addData((t(500), "view", 0.0)) // watermark passes the first windows
      q.processAllAvailable()

      val loaded = JdbcSink.queryLong(conn, "SELECT count(*) FROM windowed_counts")
      assert(loaded == 2L, s"exactly the two finalized windows load, got $loaded")
      assert(JdbcSink.queryLong(conn,
        """SELECT "n_events" FROM windowed_counts WHERE "event_type" = 'click'""") == 2L)
      assert(batches.map(_._2).sum == 2L) // observer saw the same rows
    } finally { q.stop(); conn.close() }
  }

  test("StreamLoad restart from checkpoint: committed windows are not re-loaded") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.{JdbcSink, SqlSink}
    val conn = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:graft_restart;create=true")
    val input = MemoryStream[(Timestamp, String, Double)]
    def agg = EventStream.tumblingCounts(input.toDF().toDF("ts", "event_type", "value"))
    JdbcSink.run(conn, Seq(SqlSink.createTableSql(
      "restart_counts", agg.schema, ifNotExists = false, varcharWidth = 64)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt").toString
    def connect() = java.sql.DriverManager.getConnection("jdbc:derby:memory:graft_restart")

    val q1 = graft.streaming.StreamLoad.toJdbc(agg, "restart_counts", connect _, ckpt)
    try {
      input.addData((t(5), "click", 1.0), (t(300), "view", 0.0))
      q1.processAllAvailable() // finalizes + loads the 00:00 click window
      assert(JdbcSink.queryLong(conn, "SELECT count(*) FROM restart_counts") == 1L)
    } finally q1.stop()

    // restart against the SAME checkpoint: the committed batch must not
    // replay; only windows finalized by new data load
    val q2 = graft.streaming.StreamLoad.toJdbc(agg, "restart_counts", connect _, ckpt)
    try {
      input.addData((t(700), "view", 0.0)) // watermark passes 05:00's window
      q2.processAllAvailable()
      val n = JdbcSink.queryLong(conn, "SELECT count(*) FROM restart_counts")
      assert(n == 2L, s"expected the click window once + the 05:00 view window, got $n rows")
      assert(JdbcSink.queryLong(conn,
        """SELECT count(*) FROM restart_counts WHERE "event_type" = 'click'""") == 1L,
        "restart must not re-load the already-committed window")
    } finally { q2.stop(); conn.close() }
  }

  test("windowed approx distinct users: streaming equals batch on finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val q = EventStream.distinctUsers(input.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("hll_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val rows = (1L to 40L).map(u => (u, t((u % 50).toInt))) ++ Seq((7L, t(20)), (7L, t(30)))
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((999L, t(600))) // advance watermark past 00:xx windows
      q.processAllAvailable()
      val got = spark.table("hll_test")
        .select($"window_start".cast("string"), $"approx_users")
        .as[(String, Long)].collect().toMap
      val batch = EventStream.distinctUsers(rows.toDF("user_id", "ts"))
        .select($"window_start".cast("string"), $"approx_users")
        .as[(String, Long)].collect().toMap
      // identical sketch, identical estimate, and near-exact at 40 users
      assert(got("2024-01-01 00:00:00") == batch("2024-01-01 00:00:00"))
      assert(math.abs(batch("2024-01-01 00:00:00") - 40L) <= 2)
    } finally q.stop()
  }

  test("session_window streaming: finalized sessions match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val q = EventStream.sessionCounts(input.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("sesswin_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val rows = Seq((1L, t(0)), (1L, t(10)), (1L, t(40)), (1L, t(100)), (2L, t(5)))
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((9L, t(600))) // watermark (600 - 120) passes every session end
      q.processAllAvailable()

      val got = spark.table("sesswin_test")
        .select($"user_id", $"session_start".cast("string"), $"n_events")
        .as[(Long, String, Long)].collect().toSet
      val batch = EventStream.sessionCounts(rows.toDF("user_id", "ts"))
        .select($"user_id", $"session_start".cast("string"), $"n_events")
        .as[(Long, String, Long)].collect().toSet
      assert(batch == Set(
        (1L, "2024-01-01 00:00:00", 3L), // t0,t10,t40 merge (exact-gap joins)
        (1L, "2024-01-01 01:40:00", 1L),
        (2L, "2024-01-01 00:05:00", 1L)))
      assert(got == batch)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to lookback clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]

    val q = EventStream.intervalJoin(
        purchases.toDF().toDF("p_user", "p_id", "p_ts"),
        clicks.toDF().toDF("c_user", "c_id", "c_ts"))
      .writeStream.format("memory").queryName("attrib_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      clicks.addData(
        (1L, 100L, t(20)), // outside the 30 min lookback of the t(60) purchase
        (1L, 101L, t(40)), (1L, 102L, t(55)), // inside
        (2L, 200L, t(50))) // wrong user
      purchases.addData((1L, 900L, t(60)))
      q.processAllAvailable()
      val got = spark.table("attrib_test")
        .select($"user_id", $"p_id", $"c_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 900L, 101L), (1L, 900L, 102L)))
    } finally q.stop()

    // batch twin over the same rows: identical matches
    val batch = EventStream.intervalJoin(
        Seq((1L, 900L, t(60))).toDF("p_user", "p_id", "p_ts"),
        Seq((1L, 100L, t(20)), (1L, 101L, t(40)), (1L, 102L, t(55)),
          (2L, 200L, t(50))).toDF("c_user", "c_id", "c_ts"))
      .select($"user_id", $"p_id", $"c_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch == Set((1L, 900L, 101L), (1L, 900L, 102L)))
  }

  test("stream-static enrichment broadcasts the dimension, no stream state") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 1.5), ("view", 0.5)).toDF("event_type", "weight")
    val input = MemoryStream[(Timestamp, String)]
    val q = EventStream.enriched(
      input.toDF().toDF("ts", "event_type"), dim, "event_type")
      .writeStream.format("memory").queryName("enriched_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((t(1), "click"), (t(2), "view"), (t(3), "error"))
      q.processAllAvailable()
      val got = spark.table("enriched_test")
        .select($"event_type", $"weight").as[(String, Option[Double])]
        .collect().toSet
      assert(got == Set(
        ("click", Some(1.5)), ("view", Some(0.5)), ("error", None)))
      assert(q.lastProgress.stateOperators.isEmpty,
        "a stream-static join must hold NO streaming state")
    } finally q.stop()
  }

  test("StreamDedup keeps first-seen per digest within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = graft.streaming.StreamDedup.firstSeen(docs, "text")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        (t(0), 1L, "Hello World"), (t(1), 2L, "  hello   world "),
        (t(2), 3L, "different"))
      q.processAllAvailable()
      val got = spark.table("dedup_test").select("doc_id").as[Long].collect().toSet
      assert(got.contains(3L))
      assert(got.intersect(Set(1L, 2L)).size == 1) // one survivor of the dup pair
    } finally q.stop()

    // batch twin on the same rows
    val batch = graft.streaming.StreamDedup.firstSeen(
      Seq((t(0), 1L, "Hello World"), (t(1), 2L, "  hello   world "), (t(2), 3L, "different"))
        .toDF("ts", "doc_id", "text"), "text")
    assert(batch.count() == 2)
  }

  test("StreamFunnel: finalized sessions match the batch funnel, incl. out-of-order delivery") {
    import graft.streaming.{FunnelEvent, StreamFunnel}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.funnelize(spark, input.toDS())
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode(OutputMode.Append())
      .start()
    // user 1 session A: full in-order funnel; session B (after gap): click only.
    // user 2: purchase BEFORE the first view (must not count), then the
    // view arrives LATE (next micro-batch, within watermark) followed by
    // an already-seen click unlocking retroactively -> reached = 2.
    // user 3: view only.
    // batch1 caps at t(10) so the watermark (max - 1h) stays below t(5)
    // and batch2's late view is genuinely within-watermark
    val batch1 = Seq(
      FunnelEvent(1L, 1L, "view", t(0)), FunnelEvent(1L, 2L, "click", t(5)),
      FunnelEvent(1L, 3L, "purchase", t(10)),
      FunnelEvent(2L, 5L, "purchase", t(3)), FunnelEvent(2L, 6L, "click", t(10)),
      FunnelEvent(3L, 7L, "view", t(8)))
    val batch2 = Seq(
      FunnelEvent(2L, 8L, "view", t(5)),
      FunnelEvent(1L, 4L, "click", t(120)))
    val push1 = Seq(FunnelEvent(99L, 9L, "view", t(3000)))
    val push2 = Seq(FunnelEvent(99L, 10L, "view", t(6000)))
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      input.addData(push1)
      q.processAllAvailable()
      input.addData(push2)
      q.processAllAvailable()

      // the pusher user's own sessions can never finalize (nothing advances
      // the watermark past them), so compare the real users only
      val streamed = StreamFunnel.funnelRollup(
        spark.table("funnel_test").filter($"user_id" < 99))
        .as[(Int, String, Long, Long, Double, Double)].collect().toSet

      // the batch operator over the same (real) events
      val batchDf = (batch1 ++ batch2).map(e => (e.user_id, e.event_id, e.event_type, e.ts))
        .toDF("user_id", "event_id", "event_type", "ts")
      val expected = graft.operators.Funnel.sessionFunnel(batchDf)
        .as[(Int, String, Long, Long, Double, Double)].collect().toSet
      assert(streamed == expected, s"streamed=$streamed expected=$expected")

      // the retroactive unlock really happened: user 2's session reached 2
      val u2 = spark.table("funnel_test").filter($"user_id" === 2L)
        .select($"reached").as[Int].collect().toSeq
      assert(u2 == Seq(2), s"$u2")
    } finally q.stop()
  }

  test("StreamRetention: increment rollup equals the batch cohorts, re-delivery folds away") {
    import graft.streaming.{RetentionEvent, StreamRetention}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RetentionEvent]
    val q = StreamRetention.hits(spark, input.toDS())
      .writeStream.format("memory").queryName("retention_test")
      .outputMode(OutputMode.Append())
      .start()
    def d(day: Int, min: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-${day}%02d ${min / 60}%02d:${min % 60}%02d:00")
    // user 1 active days 1,2,4; user 2 days 1,1 (dup), 3; user 3 day 2 only
    val batch1 = Seq(
      RetentionEvent(1L, d(1, 10)), RetentionEvent(2L, d(1, 20)),
      RetentionEvent(2L, d(1, 50)), RetentionEvent(1L, d(2, 5)),
      RetentionEvent(3L, d(2, 30)))
    val batch2 = Seq(
      RetentionEvent(1L, d(2, 40)), // re-delivered day for user 1: no increment
      RetentionEvent(2L, d(3, 10)), RetentionEvent(1L, d(4, 10)))
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()

      val streamed = StreamRetention.rollup(spark.table("retention_test"))
        .as[(java.sql.Date, Int, Long, Long, Double)].collect().toSet
      val batchDf = (batch1 ++ batch2).map(e => (e.user_id, e.ts)).toDF("user_id", "ts")
      val expected = graft.operators.Funnel.retentionCohorts(batchDf)
        .as[(java.sql.Date, Int, Long, Long, Double)].collect().toSet
      assert(streamed == expected, s"streamed=$streamed expected=$expected")

      // exactly-once increments: user 1 emitted one row per distinct day
      val u1 = spark.table("retention_test").filter($"user_id" === 1L).count()
      assert(u1 == 3, s"$u1")
    } finally q.stop()
  }

  test("StreamRetention drops a late event whose day predates the stream-seen cohort") {
    import graft.streaming.{RetentionEvent, StreamRetention}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RetentionEvent]
    val q = StreamRetention.hits(spark, input.toDS())
      .writeStream.format("memory").queryName("retention_late_test")
      .outputMode(OutputMode.Append())
      .start()
    def d(day: Int, min: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-${day}%02d ${min / 60}%02d:${min % 60}%02d:00")
    try {
      // the stream first sees user 7 on day 3 -> that is the cohort
      input.addData(Seq(RetentionEvent(7L, d(3, 10))))
      q.processAllAvailable()
      // a within-watermark delivery of an EARLIER day (the true first
      // activity) arrives later: it must emit NOTHING — a negative
      // day_offset row is one the batch twin can never produce. A later
      // new day still increments normally.
      input.addData(Seq(RetentionEvent(7L, d(2, 50)), RetentionEvent(7L, d(4, 5))))
      q.processAllAvailable()

      val rows = spark.table("retention_late_test").filter($"user_id" === 7L)
        .select($"cohort_day", $"day_offset").as[(Int, Int)].collect().toSeq.sorted
      val cohort = rows.head._1
      assert(rows.map(_._2) == Seq(0, 1), s"$rows")
      assert(rows.forall(_._1 == cohort), s"$rows")
      assert(rows.forall(_._2 >= 0), s"negative offset leaked: $rows")
    } finally q.stop()
  }

  test("SessionState closes sessions on gap and on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = SessionState.sessionize(spark, input.toDS())
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: 3 events then a >30min gap then 2 events
      input.addData(
        SessionEvent(1L, 1L, t(0)), SessionEvent(1L, 2L, t(10)), SessionEvent(1L, 3L, t(20)),
        SessionEvent(1L, 4L, t(120)), SessionEvent(1L, 5L, t(125)))
      q.processAllAvailable()
      // push watermark way forward so the open session times out and closes
      input.addData(SessionEvent(99L, 6L, t(2000)))
      q.processAllAvailable()
      input.addData(SessionEvent(99L, 7L, t(4000)))
      q.processAllAvailable()

      val got = spark.table("sessions_test")
        .select($"user_id", $"n_events").as[(Long, Long)].collect().toSeq
        .filter(_._1 == 1L).sorted
      assert(got == Seq((1L, 2L), (1L, 3L)))
    } finally q.stop()
  }
}
