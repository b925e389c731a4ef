package graft

/** Ad-hoc source-scan audit: how many times does a query's EXECUTED plan
  * scan the source files? Duplicated subtrees surface here as repeated
  * `FileScan` nodes — i.e. repeated corpus passes at 100 TB (this is how
  * the 36-scan q63 / 8-scan q65 recomputation bugs were found; both are
  * now materialize-once via localCheckpoint). Usage:
  * `runMain graft.ScanCount <q1,q2,...> [sfDir]`
  */
object ScanCount {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    for (name <- args(0).split(",")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val s = df.queryExecution.executedPlan.toString
      def c(p: String) = s.linesIterator.count(_.contains(p))
      println(s"[scancount] $name FileScan=${c("FileScan")} Reused=${c("ReusedExchange")}")
    }
    spark.stop()
  }
}
