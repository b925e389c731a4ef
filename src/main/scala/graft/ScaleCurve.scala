package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Scaling-curve harness for the dedup family's bounded-candidate claims.
  *
  * The 100 TB story for the near-dup operators rests on analytical bounds
  * (band-bucketed candidate generation, hot-bucket caps, prefix filters).
  * This tool measures them: run each named query over a ladder of corpus
  * sizes (the driver dirs + `GenData` output) and record, per (dir, query),
  *
  *   - `sec`            min wall time over `reps` runs,
  *   - `shufRecords`    total shuffle-read records across all tasks —
  *                      the candidate-volume proxy; linear growth in corpus
  *                      size is the claim under test,
  *   - `maxTaskRecords` the largest single task's shuffle-read records —
  *                      the skew/blowup detector: a quadratic hot bucket
  *                      shows up here long before total volume moves,
  *   - `maxTaskMs`      the slowest task — straggler detector.
  *
  * One JSON line per measurement (stdout) for SURVEY's scaling table.
  * Usage:
  *   runMain graft.ScaleCurve <q1,q2,...> <dir1,dir2,...> [reps]
  */
object ScaleCurve {

  private class TaskStats extends SparkListener {
    @volatile var shufRecords = 0L
    @volatile var maxTaskRecords = 0L
    @volatile var maxTaskMs = 0L
    @volatile var inputRecords = 0L
    // per-stage straggler ledger (SPARK_GRAFT_STAGE_DETAIL=1): stage id →
    // (callsite name, tasks, Σ read, max task read, max task ms) — the
    // drill-down that tells a hot KEY GROUP from a hot STAGE (the r10 q63
    // lesson: the global max-task number alone misattributed the tail)
    val stages = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long, Long, Long, Long)]()
    private val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    def reset(): Unit = {
      shufRecords = 0; maxTaskRecords = 0; maxTaskMs = 0; inputRecords = 0
      stages.clear(); names.clear()
    }
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
      names.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n').take(80))
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val m = t.taskMetrics
      if (m != null) {
        val r = m.shuffleReadMetrics.recordsRead
        shufRecords += r
        if (r > maxTaskRecords) maxTaskRecords = r
        val ms = m.executorRunTime
        if (ms > maxTaskMs) maxTaskMs = ms
        // scan-side rows: the probe that still sees work when every join
        // in a toy-scale plan goes through a BROADCAST exchange (broadcast
        // rows never appear in shuffle-read metrics)
        inputRecords += m.inputMetrics.recordsRead
        val sid = t.stageId
        val prev = stages.getOrDefault(sid,
          (names.getOrDefault(sid, sid.toString), 0L, 0L, 0L, 0L))
        stages.put(sid, (prev._1, prev._2 + 1, prev._3 + r,
          math.max(prev._4, r), math.max(prev._5, ms)))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dirs = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // partitions default to the thread count, but at the top of the data
    // ladder a fixed count makes every task grow linearly with the corpus
    // — override to model the cluster rule "partitions scale with data"
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus.toString).toInt
    val spark = GraftSession.builder(s"local[$cpus]", parts).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    for (dir <- dirs; name <- names) {
      var best = Double.MaxValue
      var line = ""
      // stage ledger SNAPSHOTTED when `best` is taken, so the printed
      // drill-down always describes the same rep as the headline line —
      // printing the live ledger would show the LAST rep's stages next to
      // the BEST rep's numbers (the misattribution this tool exists to
      // prevent)
      var bestStages = Seq.empty[(Int, (String, Long, Long, Long, Long))]
      for (_ <- 1 to reps) {
        stats.reset()
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[scalecurve] $name @ $dir failed: $e"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give the bus a beat before
        // reading the counters for this rep
        Thread.sleep(500)
        if (ok && sec < best) {
          best = sec
          line = f"""{"query":"$name","dir":"$dir","sec":$sec%.2f,""" +
            s""""shufRecords":${stats.shufRecords},"maxTaskRecords":${stats.maxTaskRecords},""" +
            s""""inputRecords":${stats.inputRecords},"maxTaskMs":${stats.maxTaskMs}}"""
          import scala.jdk.CollectionConverters._
          bestStages = stats.stages.asScala.toSeq
        }
      }
      if (line.nonEmpty) println(line)
      if (sys.env.get("SPARK_GRAFT_STAGE_DETAIL").contains("1")) {
        bestStages.sortBy(-_._2._5).take(8).foreach {
          case (sid, (nm, tasks, read, maxRead, maxMs)) =>
            println(s"""  [stage $sid] "$nm" tasks=$tasks read=$read maxTaskRead=$maxRead maxTaskMs=$maxMs""")
        }
      }
    }
    spark.stop()
  }
}
