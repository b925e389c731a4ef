package graft

import graft.streaming.DriftMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class DriftMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("windowed KS fires per finalized window and matches the batch statistic") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    var alerts = Vector.empty[(String, String, Long, Double)]
    val q = DriftMonitor.start(
      input.toDF().toDF("ts", "source", "n_chars"),
      "ts", "source", "n_chars",
      windowDuration = "1 hour", watermarkDelay = "10 minutes",
      onWindow = (ws, ks) =>
        alerts ++= ks.as[(String, Long, Double)].collect()
          .map(r => (ws.toString, r._1, r._2, r._3)).sorted)
    try {
      // window 0: sources fully disjoint -> KS = 1 for both
      input.addData(
        (t(5), "a", 1L), (t(10), "a", 2L), (t(15), "b", 9L), (t(20), "b", 8L),
        // window 1: identical distributions -> KS = 0
        (t(65), "a", 5L), (t(70), "b", 5L))
      q.processAllAvailable()
      input.addData((t(300), "a", 1L)) // advance watermark past both windows
      q.processAllAvailable()
    } finally q.stop()

    assert(alerts.filter(_._1.startsWith("2024-01-01 00:")) ==
      Vector(("2024-01-01 00:00:00.0", "a", 2L, 1.0),
        ("2024-01-01 00:00:00.0", "b", 2L, 1.0)))
    assert(alerts.filter(_._1.startsWith("2024-01-01 01:")) ==
      Vector(("2024-01-01 01:00:00.0", "a", 1L, 0.0),
        ("2024-01-01 01:00:00.0", "b", 1L, 0.0)))

    // the streaming numbers are the BATCH statistic, window by window
    val batchW0 = graft.operators.Drift.ksDrift(
      Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 9L), (4L, "b", 8L))
        .toDF("doc_id", "source", "n_chars"))
      .as[(String, Long, Double)].collect().toSet
    assert(batchW0 == alerts.filter(_._1.startsWith("2024-01-01 00:"))
      .map(a => (a._2, a._3, a._4)).toSet)
  }
}
