package graft

/** Scratch probe (test scope): pairwise dHash distances of the
  * StreamFingerprintSpec fixture texts — run to re-verify the fixture's
  * separation margins (base family at 0, the pat() images mutually > 4).
  */
object ProbePhashDist {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 6).trim
    def pat(a: Int, b: Int) = (0 until base.length).map(i => ('a' + (i * a + b) % 26).toChar).mkString
    val docs = Seq((1L, base), (2L, base.updated(10, 'Q')), (3L, pat(7, 3)),
      (4L, base.updated(20, 'Z')), (5L, pat(13, 7)), (6L, base), (7L, pat(3, 11)))
      .toDF("doc_id", "text")
    val ph = graft.operators.Multimodal.imagePhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (a <- ph.keys.toSeq.sorted; b <- ph.keys.toSeq.sorted if a < b)
      println(s"HAM $a $b = " + java.lang.Long.bitCount(ph(a) ^ ph(b)))
    spark.stop()
  }
}
