package graft

import graft.streaming.StreamUpsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

class StreamUpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("micro-batched updates keep the table at latest-version-wins state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream_upsert").toString
    val ckpt = Files.createTempDirectory("stream_upsert_ckpt").toString

    Seq((1L, "a", 0L, "d1"), (2L, "b", 0L, "d1"), (3L, "c", 0L, "d2"))
      .toDF("k", "attr", "ver", "day")
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val input = MemoryStream[(Long, String, Long, String)]
    var batches = Vector.empty[(Long, Long)]
    val q = StreamUpsert.start(
      input.toDF().toDF("k", "attr", "ver", "day"),
      dir, Seq("k"), "ver", "day", ckpt,
      onBatch = (id, n) => batches :+= (id, n))
    try {
      input.addData((1L, "a1", 1L, "d1"), (9L, "z", 1L, "d2"))
      q.processAllAvailable()
      // second batch: update key 9 again AND deliver a stale version for 2
      input.addData((9L, "z2", 2L, "d2"), (2L, "stale", 0L, "d1"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(dir).as[(Long, String, Long, String)]
      .collect().toSet
    assert(out == Set(
      (1L, "a1", 1L, "d1"),
      (2L, "stale", 0L, "d1"), // same version: the update wins (upsert tie rule)
      (3L, "c", 0L, "d2"),
      (9L, "z2", 2L, "d2")))
    assert(batches.map(_._2) == Vector(2L, 2L))
  }
}
