package graft

/** Dev probe (r20): run one registered query and dump per-stage wall/task
  * time from a SparkListener — the "which stage is slow" answer the Spark
  * UI would give (it is disabled in this harness).
  * Usage: Test/runMain graft.ProbeStages <query> [sfDir] [reps]
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.put(si.stageId,
          (si.name.takeWhile(_ != '\n').take(90), wall,
            si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    for (i <- 1 to reps) {
      stages.clear()
      System.gc(); Thread.sleep(250)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      if (i == reps) {
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq.sortBy(-_._2._2)
        println(f"[stages] $name rep $i wall $wall%.2f s, ${rows.size} stages; top by stage wall:")
        rows.take(18).foreach { case (id, (nm, w, run, nt)) =>
          println(f"[stages]   #$id%4d wall ${w / 1000.0}%6.2f s  taskRun ${run / 1000.0}%7.2f s  tasks $nt%3d  $nm")
        }
        println(f"[stages] total stage wall ${rows.map(_._2._2).sum / 1000.0}%.2f s, total taskRun ${rows.map(_._2._3).sum / 1000.0}%.2f s")
      } else println(f"[stages] $name rep $i wall $wall%.2f s")
    }
    spark.stop()
  }
}
