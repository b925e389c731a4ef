package graft

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch probe (test scope, not shipped): prints the LSH near-dup gate's
  * actual recall numerator/denominator per scale factor so the gate floor
  * is set with a measured margin, not a guess.
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.01", "0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/sf$sf")
      val lsh = Dedup.embeddingNearDupLshPairs(emb, "vec_id", "embedding", 0.4)
        .filter(col("id_a") < 500 && col("id_b") < 500).select("id_a", "id_b")
      val brute = Dedup.embeddingNearDupPairs(
        emb.filter(col("vec_id") < 500), "vec_id", "embedding", 0.4)
        .select("id_a", "id_b")
      val nTrue = brute.count()
      val nFound = brute.join(lsh, Seq("id_a", "id_b"), "left_semi").count()
      println(s"RECALL sf$sf: $nFound / $nTrue = ${nFound.toDouble / nTrue}")

      val q = emb.filter(col("vec_id") < 10)
      val bruteK = operators.Knn.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      def recall(ann: org.apache.spark.sql.DataFrame): Double = {
        val hits = bruteK.select("query_id", "neighbor_id")
          .join(ann.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi").count()
        hits.toDouble / bruteK.count()
      }
      println(s"ANN-LSH recall@5 sf$sf: " +
        recall(operators.Knn.lshTopK(emb, q, "vec_id", "embedding", 5)))
      println(s"ANN-IVF recall@5 sf$sf: " +
        recall(operators.IvfKnn.topK(emb, q, "vec_id", "embedding", 5)))
    }
    spark.stop()
  }
}
