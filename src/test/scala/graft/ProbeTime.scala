package graft

/** Scratch probe (test scope): time individual SparkEntry queries at a
  * given sf dir without a full bench sweep.
  * Usage: Test/runMain graft.ProbeTime <sfDir> <queryName>...
  */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q17_approx_distinct")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    for (n <- names; rep <- 1 to 2) {
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIME $n rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
