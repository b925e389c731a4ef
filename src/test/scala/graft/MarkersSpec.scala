package graft

import graft.streaming.Markers

import java.nio.file.Files

class MarkersSpec extends SparkTestBase {

  private def touch(dir: String, name: String): Unit = {
    new java.io.File(s"$dir/_batches").mkdirs()
    new java.io.File(s"$dir/_batches/$name").createNewFile()
  }

  test("legacy bare markers: days after the migration bound are never shadowed; mb keeps claiming") {
    val dir = Files.createTempDirectory("markers").toString
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toEpochDay
    // a pre-upgrade stream whose counter ran PAST today's epoch day left
    // a contiguous bare range — simulate its edges plus a legitimate
    // pre-upgrade day marker
    touch(dir, "5")                      // old stream batch
    touch(dir, (today - 10).toString)    // a day that really ran pre-upgrade
    touch(dir, (today + 50).toString)    // stream counter in future-day range

    // day namespace: bare ids ≤ the migration bound stay honored (a
    // deployed index never re-applies its history)...
    assert(Markers.applied(spark, dir, today - 10, "day"))
    assert(Markers.applied(spark, dir, 5, "day"))
    // ...but a FUTURE ingest day is not shadowed by the stream's range —
    // the systematic pre-fix failure: every day until the counter's max
    // silently no-op'd
    assert(!Markers.applied(spark, dir, today + 50, "day"))
    // mb namespace: all bare ids claimed (the stream's checkpoint resumes
    // past its own range; residual day-id collisions are sparse)
    assert(Markers.applied(spark, dir, today + 50, "mb"))
    assert(Markers.applied(spark, dir, 5, "mb"))
    // unmarked ids are unclaimed in both
    assert(!Markers.applied(spark, dir, today + 51, "day"))
    assert(!Markers.applied(spark, dir, today + 51, "mb"))

    // the sentinel persisted on first consult and is stable
    val sentinel = new java.io.File(s"$dir/_batches/_migration")
    assert(sentinel.exists())
    val recorded = new String(
      java.nio.file.Files.readAllBytes(sentinel.toPath), "UTF-8").trim.toLong
    assert(recorded == today)
    // namespaced markers always win regardless of the bound
    touch(dir, s"day-${today + 50}")
    assert(Markers.applied(spark, dir, today + 50, "day"))
  }
}
