package graft

import graft.sources.PartitionedUpsert
import org.apache.spark.sql.functions._

import java.nio.file.Files

class PartitionedUpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("upsertInto merges one partition and leaves the others' files untouched") {
    val dir = Files.createTempDirectory("upsert").toString
    val base = Seq(
      (1L, "a", 0L, "d1"), (2L, "b", 0L, "d1"),
      (3L, "c", 0L, "d2"), (4L, "d", 0L, "d3"))
      .toDF("k", "attr", "ver", "day")
    base.write.mode("overwrite").partitionBy("day").parquet(dir)

    def files(day: String): Map[String, Long] =
      new java.io.File(s"$dir/day=$day").listFiles
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    val d2Before = files("d2"); val d3Before = files("d3")

    // update key 1, insert key 9 — both in day d1 only
    val updates = Seq((1L, "a9", 1L, "d1"), (9L, "z", 1L, "d1"))
      .toDF("k", "attr", "ver", "day")
    PartitionedUpsert.upsertInto(spark, dir, updates, Seq("k"), "ver", "day")

    val out = spark.read.parquet(dir).as[(Long, String, Long, String)]
      .collect().toSet
    assert(out == Set(
      (1L, "a9", 1L, "d1"), (2L, "b", 0L, "d1"), (9L, "z", 1L, "d1"),
      (3L, "c", 0L, "d2"), (4L, "d", 0L, "d3")))
    // untouched partitions: exactly the same files, not rewritten
    assert(files("d2") == d2Before && files("d3") == d3Before)
  }

  test("upsertInto with no updates is a no-op") {
    val dir = Files.createTempDirectory("upsert0").toString
    Seq((1L, "a", 0L, "d1")).toDF("k", "attr", "ver", "day")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val before = new java.io.File(s"$dir/day=d1").listFiles.map(_.getName).toSet
    PartitionedUpsert.upsertInto(
      spark, dir, Seq.empty[(Long, String, Long, String)]
        .toDF("k", "attr", "ver", "day"), Seq("k"), "ver", "day")
    assert(new java.io.File(s"$dir/day=d1").listFiles.map(_.getName).toSet == before)
  }

  test("upsertInto is idempotent: re-applying the same updates changes nothing") {
    val dir = Files.createTempDirectory("upsert2").toString
    Seq((1L, "a", 0L, "d1"), (2L, "b", 0L, "d2"))
      .toDF("k", "attr", "ver", "day")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val updates = Seq((1L, "a1", 1L, "d1")).toDF("k", "attr", "ver", "day")
    PartitionedUpsert.upsertInto(spark, dir, updates, Seq("k"), "ver", "day")
    PartitionedUpsert.upsertInto(spark, dir, updates, Seq("k"), "ver", "day")
    val out = spark.read.parquet(dir).as[(Long, String, Long, String)]
      .collect().toSet
    assert(out == Set((1L, "a1", 1L, "d1"), (2L, "b", 0L, "d2")))
  }
}
