package graft

import graft.operators.{MediaRecord, Multimodal}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media pipeline: real PPM/BMP containers round-trip through decode") {
    val docs = Seq(
      (0L, "abc"), (1L, "a longer document body"), (2L, "x")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs).collect().sortBy(_.doc_id)
    assert(media.map(_.fmt).toSeq == Seq("ppm", "bmp", "ppm"))
    // the payload IS a real container: magic bytes present, text embedded
    assert(new String(media(0).payload.take(2), "US-ASCII") == "P6")
    assert(new String(media(1).payload.take(2), "US-ASCII") == "BM")
    assert(new String(media(0).payload, "ISO-8859-1").contains("abc"))

    val meta = Multimodal.metaFromDocuments(spark, docs)
      .as[(Long, String, Long, Int, Int)].collect().sortBy(_._1)
    // doc 0: n=3 -> w=19, h=1, ppm size = 9 + 2 + 1 + 3*19 = 69
    assert(meta(0) == ((0L, "ppm", 69L, 19, 1)))
    // doc 1: n=22 -> w=38, h=1, bmp rowSize=((114+3)/4)*4=116, size=170
    assert(meta(1) == ((1L, "bmp", 170L, 38, 1)))
    // decoded sizes equal the actual byte arrays, not arithmetic on text
    assert(meta.map(_._3).toSeq == media.map(_.payload.length.toLong).toSeq)
  }

  test("decode parses headers from bytes and rejects junk") {
    // hand-built 5x2 PPM: dims come from the HEADER, not the fmt label
    val ppm = Multimodal.encodePpm(Array.fill[Byte](30)(7), 5, 2)
    val out = Multimodal.decode(Seq(MediaRecord(7L, "mislabeled", ppm)))
    assert(out == Seq(graft.operators.MediaMeta(7L, "ppm", ppm.length.toLong, 5, 2)))
    // BMP with top-down (negative height) rows still reports positive dims
    val bmp = Multimodal.encodeBmp(Array.fill[Byte](12)(1), 2, 2)
    val buf = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2)
    assert(Multimodal.decode(Seq(MediaRecord(8L, "bmp", bmp))).head.height == 2)
    intercept[IllegalArgumentException] {
      Multimodal.decode(Seq(MediaRecord(9L, "png", Array[Byte](1, 2, 3, 4))))
    }
    // a correct magic with a garbage header must reject too, not decode
    // as a 0x0 image
    intercept[IllegalArgumentException] {
      Multimodal.decode(Seq(MediaRecord(10L, "ppm",
        Array[Byte]('P', '6', -1, -2, -3, -4, -5))))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decode(Seq(MediaRecord(11L, "ppm",
        "P6\n100 100\n255\n".getBytes("US-ASCII"))))
    }
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
