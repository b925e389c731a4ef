package graft

import org.apache.spark.sql.functions._

/** Ad-hoc probe (not a spec): projected-kNN recall and pairwise-cosine MAE
  * at several out-dims — the numbers behind q77's gate bound and the
  * "ranking scrambles on near-uniform data" scaladoc claim.
  */
object ProbeProjection {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"); d <- Seq(16, 32)) {
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val cos = graft.plans.VectorFunctions.cosineSimilarity _
      val sub = emb.filter(col("vec_id") < 200)
        .select(col("vec_id").as("id"), col("embedding").cast("array<float>").as("v"))
      val subP = graft.operators.Embeddings
        .randomProjectVec(emb.filter(col("vec_id") < 200), outDim = d)
        .select(col("vec_id").as("id"), col("embedding").as("p"))
      val mae = sub.as("a").join(sub.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("ia"), col("b.id").as("ib"), cos(col("a.v"), col("b.v")).as("cf"))
        .join(subP.select(col("id").as("ia"), col("p").as("pa")), Seq("ia"))
        .join(subP.select(col("id").as("ib"), col("p").as("pb")), Seq("ib"))
        .agg(avg(abs(col("cf") - cos(col("pa"), col("pb"))))).head().getDouble(0)
      val proj = graft.operators.Embeddings.randomProjectVec(emb, outDim = d)
      val q = proj.filter(col("vec_id") < 10)
      val brute = graft.operators.Knn.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      val ann = graft.operators.Knn.bruteForceTopK(proj, q, "vec_id", "embedding", 5)
      val hits = brute.select("query_id", "neighbor_id")
        .join(ann.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[probe] $dir outDim=$d mae=$mae%.4f recall@5=${hits / 50.0}%.2f")
    }
    spark.stop()
  }
}
