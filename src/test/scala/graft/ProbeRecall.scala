package graft

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch probe (test scope, not shipped): prints the LSH near-dup gate's
  * actual recall numerator/denominator per scale factor — swept over the
  * multiprobe count — so the gate floors are set with a measured margin,
  * not a guess.
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- sys.env.getOrElse("PROBE_SFS", "0.01,0.1").split(",").toSeq) {
      val emb = Tables.embeddings(spark, s"/root/testdata/sf$sf")
      val brute = Dedup.embeddingNearDupPairs(
        emb.filter(col("vec_id") < 500), "vec_id", "embedding", 0.4)
        .select("id_a", "id_b").cache()
      val nTrue = brute.count()
      for (probes <- Seq(0, 1, 2, 3)) {
        val lsh = Dedup.embeddingNearDupLshPairs(
          emb, "vec_id", "embedding", 0.4, probes = probes)
          .filter(col("id_a") < 500 && col("id_b") < 500).select("id_a", "id_b")
        val nFound = brute.join(lsh, Seq("id_a", "id_b"), "left_semi").count()
        println(s"NEARDUP-RECALL sf$sf probes=$probes: " +
          s"$nFound / $nTrue = ${nFound.toDouble / nTrue}")
      }

      val q = emb.filter(col("vec_id") < 10)
      val bruteK = operators.Knn.bruteForceTopK(emb, q, "vec_id", "embedding", 5).cache()
      def recall(ann: org.apache.spark.sql.DataFrame): Double = {
        val hits = bruteK.select("query_id", "neighbor_id")
          .join(ann.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi").count()
        hits.toDouble / bruteK.count()
      }
      for (probes <- Seq(0, 1, 2, 3)) {
        println(s"ANN-LSH recall@5 sf$sf probes=$probes: " +
          recall(operators.Knn.lshTopK(emb, q, "vec_id", "embedding", 5, probes = probes)))
      }
      println(s"ANN-IVF recall@5 sf$sf: " +
        recall(operators.IvfKnn.topK(emb, q, "vec_id", "embedding", 5)))
      brute.unpersist(); bruteK.unpersist()
    }
    spark.stop()
  }
}
