package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Scratch probe (not a spec): registered-query accuracy across knobs. */
object ProbePerceptron {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         buckets <- Seq(64, 256, 1024); iters <- Seq(5, 10, 20)) {
      val docs = graft.sources.Tables.documents(spark, dir)
      val out = QualityClassifier.qualityScores(docs, buckets = buckets, iters = iters)
        .select(col("is_train"), (col("label") === 1) === col("pred"),
          col("label") === 1)
        .as[(Boolean, Boolean, Boolean)].collect()
      val (tr, he) = out.partition(_._1)
      def acc(xs: Array[(Boolean, Boolean, Boolean)]) =
        math.round(1000.0 * xs.count(_._2) / math.max(xs.length, 1)) / 1000.0
      val posFrac = math.round(1000.0 * out.count(_._3) / out.length) / 1000.0
      println(s"PROBE dir=$dir buckets=$buckets iters=$iters " +
        s"train=${acc(tr)} held=${acc(he)} posFrac=$posFrac")
    }
    spark.stop()
  }
}
