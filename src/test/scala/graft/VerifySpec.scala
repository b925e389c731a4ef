package graft

import java.nio.file.Files

class VerifySpec extends SparkTestBase {
  import spark.implicits._

  test("a crashed query still produces a dump dir with an err row") {
    val out = Files.createTempDirectory("verify-spec").toString
    val failures = Verify.dumpAll(spark, "/nonexistent-sf-dir", out, Seq(
      "good_query" -> ((s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "v") }),
      "broken_query" -> ((_, dir) => spark.read.parquet(s"$dir/no_such.parquet"))))

    assert(failures.map(_._1) == Seq("broken_query"))
    assert(failures.head._2.nonEmpty)

    // good query dumps its result as before
    val good = spark.read.parquet(s"$out/good_query")
    assert(good.columns.toSeq == Seq("id", "v") && good.count() == 1)

    // broken query dumps a SINGLE err row — the driver's comparer then sees
    // a schema/hash-mismatching red row instead of a missing query
    val bad = spark.read.parquet(s"$out/broken_query")
    assert(bad.columns.toSeq == Seq("err"))
    val row = bad.as[String].collect()
    assert(row.length == 1 && row.head.contains("AnalysisException"),
      s"err row should carry the exception class: ${row.toSeq}")
  }
}
