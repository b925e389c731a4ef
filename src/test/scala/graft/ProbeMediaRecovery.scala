package graft

/** Scratch probe (test scope): the cross-modal pipeline's planted-dup
  * recovery on the media decade corpus — compares the v2 chain's
  * canonical-stage survivors with and without crossModalDedup. The
  * media corpora plant ~3‰ char-scrambled copies (zero shared shingles:
  * text dedup blind) on top of 2‰ exact + 3‰ near copies.
  */
object ProbeMediaRecovery {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/gen/media1"
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    import graft.pipelines.CorpusPipeline
    for (flag <- Seq(false, true)) {
      val audit = CorpusPipeline
        .auditCountsV2(docs, CorpusPipeline.Config(crossModalDedup = flag))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1)
      println(s"PROBE crossModal=$flag " +
        audit.map(t => s"${t._2}=${t._3}").mkString(" "))
    }
    spark.stop()
  }
}
