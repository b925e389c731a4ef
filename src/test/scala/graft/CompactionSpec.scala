package graft

import graft.sources.Compaction

import java.nio.file.Files

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("compact collapses a fragmented partition, leaves healthy ones alone") {
    val dir = Files.createTempDirectory("compact").toString
    // d1: 20 tiny files; d2: 1 file
    (1 to 200).map(i => (i.toLong, s"v$i", "d1")).toDF("k", "v", "day")
      .repartition(20)
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    (1 to 50).map(i => (1000L + i, s"w$i", "d2")).toDF("k", "v", "day")
      .repartition(1)
      .write.mode("append").partitionBy("day").parquet(dir)

    def files(day: String): Set[String] =
      new java.io.File(s"$dir/day=$day").listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(files("d1").size == 20 && files("d2").size == 1)
    val d2Before = files("d2")
    val before = spark.read.parquet(dir).as[(Long, String, String)].collect().toSet

    val rewritten = Compaction.compact(spark, dir, "day", maxFiles = 8)
    assert(rewritten == Seq("d1"))
    assert(files("d1").size < 8, s"still ${files("d1").size} files")
    assert(files("d2") == d2Before, "healthy partition must not be rewritten")
    val after = spark.read.parquet(dir).as[(Long, String, String)].collect().toSet
    assert(after == before, "compaction must not change content")

    // second pass: nothing left to do
    assert(Compaction.compact(spark, dir, "day", maxFiles = 8).isEmpty)
  }

  test("stats reports per-partition file counts and bytes") {
    val dir = Files.createTempDirectory("compact2").toString
    (1 to 60).map(i => (i.toLong, "d1")).toDF("k", "day")
      .repartition(3).write.mode("overwrite").partitionBy("day").parquet(dir)
    val s = Compaction.stats(spark, dir, "day")
    assert(s.map(p => p.partition -> p.nFiles).toMap == Map("d1" -> 3))
    assert(s.head.totalBytes > 0)
  }
}
