package graft

import graft.operators.{Bm25, HybridRetrieval, Pq}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch probe (test scope, not shipped): prints the q85c ANN-fused vs
  * exact-fused top-10 overlap per scale factor and nprobe, so the gate
  * floor is set with a measured margin on the near-uniform sf embeddings
  * (the IVF worst case — q27's regime), not a guess.
  */
object ProbeHybridAnn {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scratch = java.nio.file.Files.createTempDirectory("probe_hyb").toString
    for (sf <- sys.env.getOrElse("PROBE_SFS", "0.001,0.01,0.1").split(",").toSeq) {
      val dir = s"/root/testdata/sf$sf"
      val docs = Tables.documents(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val bmPath = s"$scratch/$sf/bm25_idx"
      val bmIdx = Bm25.writeIndexOnce(docs, bmPath)
      val corpus = emb.join(
        docs.filter(col("text").isNotNull)
          .select(col("doc_id").cast("long").as("vec_id")),
        Seq("vec_id"), "left_semi")
      val pqPath = s"$scratch/$sf/hyb_dense_idx"
      Pq.writeIndexOnce(corpus, "vec_id", "embedding",
        Pq.train(corpus, "vec_id", "embedding", m = 8, k = 32), pqPath, nlist = 32)
      val pqIdx = Pq.readIndex(spark, pqPath)
      for (nprobe <- Seq(4, 8, 16)) {
        val (ann, exact) = HybridRetrieval.annFusedLists(
          docs, emb, bmIdx, pqIdx, nQueries = 10, legK = 20, termCap = 16,
          fuseK = 10, nprobe = nprobe, refine = 200,
          k1 = 1.2, b = 0.75, rrfK = 60.0)
        val exactC = exact.cache()
        val denom = exactC.count()
        val hits = exactC.join(ann, Seq("query_id", "neighbor_id"), "left_semi").count()
        println(s"HYBRID-ANN sf$sf nprobe=$nprobe: " +
          s"$hits / $denom = ${math.rint(1e4 * hits / denom) / 1e4}")
        exactC.unpersist()
      }
    }
    spark.stop()
  }
}
