package graft

/** Scratch probe (test scope): the cost of ARMING the hammingPairs56
  * guard on a realistic corpus — crossModalClusters with bucketCap 0 vs
  * the production default, alternated in ONE session (same JVM, same
  * page cache) so box drift can't masquerade as a regression. The r12
  * skew-split's claim under test: arming ≈ one count aggregation when
  * no key exceeds the cap.
  */
object ProbeGuardCost {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/gen/media10"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    def run(cap: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Multimodal.crossModalClusters(docs, bucketCap = cap)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed warmup (JIT + page cache), then alternate
    run(0)
    val results = (1 to reps).flatMap { r =>
      Seq(0, graft.operators.Multimodal.ProductionBucketCap).map { cap =>
        val s = run(cap)
        println(f"PROBE rep=$r cap=$cap sec=$s%.2f")
        (cap, s)
      }
    }
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (cap, rs) =>
      println(f"PROBE min cap=$cap sec=${rs.map(_._2).min}%.2f")
    }
    spark.stop()
  }
}
