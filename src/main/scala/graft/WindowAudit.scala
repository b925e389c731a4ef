package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Ad-hoc unpartitioned-window audit: which queries' EXECUTED plans
  * contain a `WindowExec` with an EMPTY partition spec? Such a window
  * moves its whole input through one task — exactly the scale trap
  * WindowExec itself warns about ("No Partition Defined ... moving all
  * data to a single partition"). A hit is only acceptable when the
  * window's input is provably bounded (post-limit, sketch output, a
  * broadcast-sized frame); anything feeding it a corpus-sized input is a
  * 100 TB bug. Usage:
  * `runMain graft.WindowAudit [sfDir] [q1,q2,...]`
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    // WARN (not ERROR) so WindowExec's own single-partition warning prints
    // interleaved with the per-query markers below: an unpartitioned window
    // running inside an EAGER sub-job (a driver-side cut/bound collect
    // during DataFrame construction) never appears in the final executed
    // plan this tool walks, but its runtime warning still betrays it.
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_AUDIT_LOG", "WARN"))
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted

    // Walk the final adaptive plan, not the initial one: AQE re-plans
    // subtrees, and only the executed tree shows what actually ran.
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    def bareWindows(p: SparkPlan): Seq[WindowExec] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case _ => Seq.empty
      }
      here ++ unwrap(p).flatMap(bareWindows) ++
        p.subqueries.flatMap(bareWindows)
    }

    var hits = 0
    for (name <- names) {
      try {
        System.err.println(s"[windowaudit] >>> $name")
        val df = SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val bare = bareWindows(df.queryExecution.executedPlan)
        if (bare.nonEmpty) {
          hits += bare.size
          println(s"[windowaudit] $name UNPARTITIONED=${bare.size} " +
            bare.map(_.windowExpression.mkString(";").take(80)).mkString(" | "))
        }
      } catch {
        case e: Throwable => println(s"[windowaudit] $name FAILED: $e")
      }
    }
    println(s"[windowaudit] total unpartitioned WindowExec nodes: $hits")
    spark.stop()
  }
}
