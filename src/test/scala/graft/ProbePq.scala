package graft

import graft.operators.{Knn, Pq}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch probe (test scope, not shipped): measured PQ+refine recall@5
  * per scale factor, swept over the refine depth and codebook size, so
  * the q105 gate floor is set with a measured margin, not a guess.
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- sys.env.getOrElse("PROBE_SFS", "0.01,0.1").split(",").toSeq) {
      val emb = Tables.embeddings(spark, s"/root/testdata/sf$sf")
      val q = emb.filter(col("vec_id") < 10)
      val bruteK = Knn.bruteForceTopK(emb, q, "vec_id", "embedding", 5).cache()
      val denom = bruteK.count()
      def recall(ann: org.apache.spark.sql.DataFrame): String = {
        val hits = bruteK.select("query_id", "neighbor_id")
          .join(ann.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi").count()
        s"$hits / $denom = ${hits.toDouble / denom}"
      }
      for (k <- Seq(16, 32); refine <- Seq(50, 200, 500)) {
        val model = Pq.train(emb, "vec_id", "embedding", m = 8, k = k)
        println(s"PQ-RECALL sf$sf m=8 k=$k refine=$refine: " +
          recall(Pq.topK(emb, q, "vec_id", "embedding", 5, model, refine = refine)))
      }
      val m32 = Pq.train(emb, "vec_id", "embedding", m = 8, k = 32)
      for (nprobe <- Seq(4, 8, 16)) {
        println(s"IVFPQ-RECALL sf$sf nlist=32 nprobe=$nprobe refine=200: " +
          recall(Pq.ivfTopK(emb, q, "vec_id", "embedding", 5, m32,
            nlist = 32, nprobe = nprobe, refine = 200)))
      }
      bruteK.unpersist()
    }
    spark.stop()
  }
}
