package graft

import org.apache.spark.sql.functions._

/** Dev probe (r20): does `.rdd.getNumPartitions` on an AQE plan with
  * exchanges execute the query's stages? Decides where Spread.ifNarrow's
  * partition probe is safe.
  */
object ProbeRddCost {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    })
    val ids = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val j = docs.join(ids, Seq("source"))
    var t0 = System.nanoTime()
    val p = j.rdd.getNumPartitions
    Thread.sleep(500)
    println(f"[probe] join-subtree parts=$p took ${(System.nanoTime()-t0)/1e9}%.2f s, jobs=$jobs")
    jobs = 0
    t0 = System.nanoTime()
    val p2 = docs.select("doc_id", "text").rdd.getNumPartitions
    Thread.sleep(500)
    println(f"[probe] scan-subtree parts=$p2 took ${(System.nanoTime()-t0)/1e9}%.2f s, jobs=$jobs")
    spark.stop()
  }
}
