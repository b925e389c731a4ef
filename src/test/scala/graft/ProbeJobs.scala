package graft

/** Dev probe (r20): per-JOB wall/taskRun breakdown with callsites — the
  * eager localCheckpoint jobs are invisible in the final plan, so this
  * attributes time to the construction step that paid it.
  * Usage: Test/runMain graft.ProbeJobs <query> [sfDir] [reps]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(var name: String, var t0: Long = 0, var t1: Long = 0,
      var taskRun: Long = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n').take(70))
          .getOrElse("?")
        jobs.put(js.jobId, J(site, js.time))
        js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.t1 = je.time)
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        Option(stageToJob.get(sc.stageInfo.stageId))
          .flatMap(j => Option(jobs.get(j))).foreach { j =>
            j.taskRun += sc.stageInfo.taskMetrics.executorRunTime
            j.tasks += sc.stageInfo.numTasks
          }
      }
    })
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    for (i <- 1 to reps) {
      jobs.clear(); stageToJob.clear()
      System.gc(); Thread.sleep(250)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      if (i == reps) {
        import scala.jdk.CollectionConverters._
        val rows = jobs.asScala.values.toSeq.sortBy(-_.taskRun)
        println(f"[jobs] $name rep $i wall $wall%.2f s, ${rows.size} jobs; top by taskRun:")
        rows.take(20).foreach { j =>
          println(f"[jobs]   wall ${(j.t1 - j.t0) / 1000.0}%6.2f s  taskRun ${j.taskRun / 1000.0}%7.2f s  tasks ${j.tasks}%4d  ${j.name}")
        }
        println(f"[jobs] total job wall ${rows.map(j => j.t1 - j.t0).sum / 1000.0}%.2f s, total taskRun ${rows.map(_.taskRun).sum / 1000.0}%.2f s")
      } else println(f"[jobs] $name rep $i wall $wall%.2f s")
    }
    spark.stop()
  }
}
