package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev probe (r20): run one registered query, then dump the executed
  * plan's operators ranked by numOutputRows — finds cardinality blowups
  * without the UI. Usage: Test/runMain graft.ProbeMetrics <query> [sfDir]
  */
object ProbeMetrics {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ => p.children.flatMap(walk)
    })
    val nodes = walk(df.queryExecution.executedPlan)
    val rows = nodes.flatMap { n =>
      n.metrics.get("numOutputRows").map(m => (m.value, n))
    }.sortBy(-_._1)
    println(s"[metrics] $name: ${nodes.size} operators in final plan")
    rows.take(25).foreach { case (v, n) =>
      println(f"[metrics] rows=$v%12d  ${n.getClass.getSimpleName}%-28s ${n.simpleString(80).take(120)}")
    }
    spark.stop()
  }
}
