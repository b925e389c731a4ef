package graft

import graft.operators.{MediaRecord, Multimodal}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media pipeline: binary payload survives, metadata is byte-derived") {
    val docs = Seq(
      (0L, "abc"), (1L, "a longer document body"), (2L, "x")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs).collect().sortBy(_.doc_id)
    assert(media.map(_.fmt).toSeq == Seq("png", "jpeg", "webp"))
    assert(new String(media(0).payload, "UTF-8") == "abc")

    val meta = Multimodal.metaFromDocuments(spark, docs)
      .as[(Long, String, Long, Int, Int)].collect().sortBy(_._1)
    assert(meta(0) == ((0L, "png", 3L, 3 % 640, (3 * 31) % 480)))
    assert(meta(1)._3 == 22L)
  }

  test("decode stub is batch-shaped and deterministic") {
    val batch = Seq(MediaRecord(7L, "png", Array[Byte](1, 2, 3, 4)))
    val out1 = Multimodal.decodeStub(batch)
    val out2 = Multimodal.decodeStub(batch)
    assert(out1 == out2)
    assert(out1.head.n_bytes == 4L)
  }

  test("streaming sentiment twin matches batch pivot on the same rows") {
    import java.sql.Timestamp
    val docs = Seq(
      (Timestamp.valueOf("2024-01-01 01:00:00"), "fast fast slow"),
      (Timestamp.valueOf("2024-01-01 02:00:00"), "slow big"),
      (Timestamp.valueOf("2024-01-02 01:00:00"), "nothing")).toDF("ts", "text")
    val out = graft.streaming.EventStream.sentimentCounts(docs)
      .selectExpr("cast(window_start as string)", "positive_count", "negative_count", "na_count")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("2024-01-01 00:00:00", 1L, 1L, 0L),
      ("2024-01-02 00:00:00", 0L, 0L, 1L)))
  }
}
