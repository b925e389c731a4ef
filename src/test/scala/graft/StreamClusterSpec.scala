package graft

import graft.operators.KMeans
import graft.streaming.StreamCluster
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamClusterSpec extends SparkTestBase {
  import spark.implicits._

  private val store = (0L until 60L).map { i =>
    val c = (i % 3).toFloat
    (i, Array(3f * c + (i % 7) * 0.01f, -2f * c + (i % 5) * 0.01f))
  }

  test("streamed assignments equal batch assignTo, with zero streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val centroids = KMeans.trainCentroids(
      store.toDF("vec_id", "embedding"), k = 3, iters = 3)

    val fresh = (100L until 112L).map { i =>
      val c = (i % 3).toFloat
      (i, Array(3f * c + 0.02f, -2f * c - 0.01f))
    }
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamCluster
      .assignments(input.toDF().toDF("vec_id", "embedding"), centroids)
      .writeStream.format("memory").queryName("stream_cluster")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(fresh.take(5): _*)
      q.processAllAvailable()
      input.addData(fresh.drop(5): _*)
      q.processAllAvailable()

      val streamed = spark.table("stream_cluster")
        .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
      val batch = KMeans
        .assignTo(fresh.toDF("vec_id", "embedding"), centroids)
        .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
      assert(streamed == batch)
      // routing is topical: same generator -> same cluster as the store
      val storeCl = KMeans
        .assignTo(store.toDF("vec_id", "embedding"), centroids)
        .as[(Long, Int, Double)].collect()
        .groupBy(_._1 % 3).map { case (g, rs) => g -> rs.map(_._2).distinct.toSeq }
      streamed.foreach { case (id, cl, _) =>
        assert(storeCl(id % 3) == Seq(cl), s"off-topic route: $id -> $cl") }
      // stateless: no state store operators at all
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected zero streaming state: ${q.lastProgress}")
    } finally q.stop()
  }
}
