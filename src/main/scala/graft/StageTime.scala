package graft

import org.apache.spark.sql.DataFrame

/** Ad-hoc stage-cost breakdown for composite operators: times named
  * sub-frames of a query with the noop sink (opt guide §1.4), reps with
  * min/max, labeled jobs (§1.5). Usage:
  *   runMain graft.StageTime <group> <sfDir> [reps]
  * Groups are defined inline below — a dev tool, not a driver surface.
  */
object StageTime {
  def main(args: Array[String]): Unit = {
    val group = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    import graft.operators._

    def stages(): Seq[(String, () => DataFrame)] = group match {
      case "xmodal" =>
        val docs = Tables.documents(spark, sfDir)
        Seq(
          "mediaFingerprints" -> (() => Multimodal.mediaFingerprints(docs)),
          "minHashPairs" -> (() => Dedup.minHashPairs(docs, "doc_id", "text")),
          "crossModalPairs" -> (() => Multimodal.crossModalPairs(docs)),
          "q121_full" -> (() => SparkEntry.queries("q121_crossmodal_clusters")(spark, sfDir)),
          "q47d_full" -> (() => SparkEntry.queries("q47d_corpus_pipeline_xmodal")(spark, sfDir)))
      case "v3" =>
        val docs = Tables.documents(spark, sfDir)
        Seq(
          "q47b_full" -> (() => SparkEntry.queries("q47b_corpus_pipeline_v2")(spark, sfDir)),
          "q47c_full" -> (() => SparkEntry.queries("q47c_corpus_pipeline_v3")(spark, sfDir)))
      case "containment" =>
        Seq(
          "q102_full" -> (() => SparkEntry.queries("q102_containment")(spark, sfDir)))
      case other =>
        Seq(other -> (() => SparkEntry.queries(other)(spark, sfDir)))
    }

    // JIT/classloader warmup (the Bench discipline) outside timed reps
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }

    stages().foreach { case (name, fn) =>
      val ts = (1 to reps).map { i =>
        System.gc(); Thread.sleep(250)
        spark.sparkContext.setJobDescription(s"stagetime:$name:$i")
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[stagetime] $name%-22s min ${ts.min}%6.2f  max ${ts.max}%6.2f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
