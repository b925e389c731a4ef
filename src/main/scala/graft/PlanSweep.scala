package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Ad-hoc plan-shape sweep over every registered query: counts the
  * operators that matter at 100 TB (exchanges, sorts, aggregate
  * fallbacks, nested-loop joins) so outliers get reviewed instead of
  * discovered in production. Usage: runMain graft.PlanSweep [sfDir]
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // AQE wraps the tree in AdaptiveSparkPlanExec before execution, hiding
    // every child from collect(); audit the static plan instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(f"${"query"}%-26s ex so sagg oagg bnlj wsc  notes")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val s = plan.toString
        def c(p: String) = s.linesIterator.count(_.contains(p))
        val ex = plan.collect { case e: ShuffleExchangeExec => e }.size
        val sorts = c("Sort ") + c("Sort(")
        val sagg = c("SortAggregate")
        val oagg = c("ObjectHashAggregate")
        val bnlj = c("BroadcastNestedLoopJoin")
        val wsc = c("WholeStageCodegen")
        val notes = Seq(
          if (sagg > 0) "SORT-AGG-FALLBACK" else "",
          if (bnlj > 0) "NESTED-LOOP" else "").filter(_.nonEmpty).mkString(",")
        println(f"$name%-26s $ex%2d $sorts%2d $sagg%4d $oagg%4d $bnlj%4d $wsc%3d  $notes")
      } catch { case e: Throwable => println(f"$name%-26s ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
