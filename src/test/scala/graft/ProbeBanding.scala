package graft

/** Scratch probe (not a spec): measured vs analytic banding S-curve. */
object ProbeBanding {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = graft.sources.Tables.documents(spark, dir)
      println(s"=== $dir")
      graft.operators.Dedup.bandingCalibration(
        docs, "doc_id", "text", detail = true)
        .orderBy("decile").show(12, false)
    }
    spark.stop()
  }
}
