package graft

/** Scratch probe (test scope): re-verify the cross-modal pipeline spec's
  * plant margins — the scrambled twin must land at ~0 Hamming from its
  * base in image AND audio (the media-only-dup signals), while the
  * control doc stays OUTSIDE the h=2 ball of the base under EVERY
  * modality. Uniform lowercase prose is nearly envelope-flat (audio
  * hamming 0 between unrelated sentences), hence the control's letter
  * runs.
  */
object ProbeXmodalPlant {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = "alpha bravo gamma delta the zulu echo foxtrot kilo lima"
    val scrambled = base.split(' ')
      .map(w => if (w.length <= 3) w else w.sorted).mkString(" ")
    val control = "the zyx wvu tsr qpo nml kji hgf edc ba " +
      "z y x w v u t s r q p o n m l k j i h g f e d c b a"
    val docs = Seq((0L, base), (1L, scrambled), (2L, control))
      .toDF("doc_id", "text")
    for ((fn, nm) <- Seq(
        (graft.operators.Multimodal.imagePhash _, "img"),
        (graft.operators.Multimodal.audioFingerprint _, "aud"),
        (graft.operators.Multimodal.videoFingerprint _, "vid"))) {
      val ph = fn(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"PLANT $nm scrambled = " + java.lang.Long.bitCount(ph(0L) ^ ph(1L)))
      println(s"PLANT $nm control   = " + java.lang.Long.bitCount(ph(0L) ^ ph(2L)))
    }
    spark.stop()
  }
}
