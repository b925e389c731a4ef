package graft

import graft.operators.QualityClassifier
import graft.streaming.StreamQualityGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamQualityGateSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(ids: Range) = ids.map { i =>
    val good = i % 2 == 0
    val words =
      if (good) Seq("the", "report", "of", "quarterly", "earnings", "is", "clear")
      else Seq("zzzz", "###", "qqqq", "####", "xxxx", "...")
    (i.toLong, (words ++ words.take(i % 3 + 1)).mkString(" "), good)
  }

  test("streamed scores equal batch scoreWith row-for-row, with zero streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val train = corpus(0 until 40).toDF("doc_id", "text", "good")
    val feats = QualityClassifier
      .featurize(train, col("good"), lit(true)).localCheckpoint()
    val w = QualityClassifier.train(feats, iters = 5)

    val fresh = corpus(100 until 112)
    val input = MemoryStream[(Long, String, Boolean)]
    val q = StreamQualityGate
      .scores(input.toDF().toDF("doc_id", "text", "good"), w)
      .writeStream.format("memory").queryName("stream_quality")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(fresh.take(5): _*)
      q.processAllAvailable()
      input.addData(fresh.drop(5): _*)
      q.processAllAvailable()

      val streamed = spark.table("stream_quality")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      // batch twin goes through the FEATURIZED path — equality also pins
      // the occurrence-fold = count-weighted-sum identity of scoreText
      val batch = QualityClassifier
        .scoreWith(
          QualityClassifier.featurize(
            fresh.toDF("doc_id", "text", "good"), col("good"), lit(false)),
          w)
        .select(col("doc_id"), col("score"), col("pred"))
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(streamed == batch)
      // the gate routes by class: good docs pass, junk docs don't
      streamed.foreach { case (id, _, pred) =>
        assert(pred == (id % 2 == 0), s"wrong gate for $id") }
      // stateless: no state store operators at all
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected zero streaming state: ${q.lastProgress}")
    } finally q.stop()
  }
}
