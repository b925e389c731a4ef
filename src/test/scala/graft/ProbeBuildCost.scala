package graft

import graft.operators.{IvfKnn, Pq}
import graft.plans.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): DECOMPOSE the IVF-PQ index build wall at
  * production nlist (r14 verdict #4). SCALING_r14 §1 reports the
  * nlist=1024 build at 104 s on 200k vectors but not WHERE it goes —
  * codebook train, coarse train (driver Lloyd is O(iters·sample·nlist·d)
  * single-threaded), corpus encode+route, the nlist-way partitioned
  * write, or the occupancy read-back. This probe times each stage
  * separately so the fix lands on the stage that is actually superlinear.
  *
  *   tools/runjava.sh -cp target/scala-2.13/classes:target/scala-2.13/test-classes:... \
  *     graft.ProbeBuildCost gen/rich10 256 1024
  */
object ProbeBuildCost {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/gen/rich10"
    val nlists = if (args.length > 1) args.drop(1).map(_.toInt) else Array(256, 1024)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = java.nio.file.Files.createTempDirectory("build_cost").toString
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def countFiles(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }

    val tag = dir.split('/').last
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.join(
      docs.filter(col("text").isNotNull)
        .select(col("doc_id").cast("long").as("vec_id")),
      Seq("vec_id"), "left_semi").localCheckpoint()
    val n = corpus.count()

    // codebook train is nlist-independent: once
    val (tTrain, model) = time(
      Pq.train(corpus, "vec_id", "embedding", m = 8, k = 32))
    println(f"BUILDCOST dir=$tag n=$n pq_train=$tTrain%.2f")

    for (nlist <- nlists) {
      val sample = math.max(4096, 4 * nlist)
      // the driver Lloyd is O(iters·sample·nlist·d) single-threaded —
      // past nlist=1024 it is the thing being replaced, don't wait on it
      val tDriver =
        if (nlist <= 1024)
          time(IvfKnn.trainCentroids(corpus, "vec_id", "embedding", nlist,
            sampleSize = sample))._1
        else -1.0
      val (tCoarse, centroids) = time(
        IvfKnn.trainCentroidsAtScale(corpus, "vec_id", "embedding", nlist))
      println(f"BUILDCOST dir=$tag nlist=$nlist " +
        f"coarse_driver=$tDriver%.2f coarse_scale=$tCoarse%.2f")
      // encode+route WITHOUT the write: noop sink
      val rows = Pq.indexRows(corpus, "vec_id", "embedding", model, centroids)
      val (tEncode, _) = time(
        rows.write.format("noop").mode("overwrite").save())
      // the write, pre-fix shape (task-parallel dynamic partitioning) —
      // capped at 1024 cells: at 4096 it shatters into ~130k files and
      // takes tens of minutes to measure a disease already quantified
      val p1 = s"$scratch/idx_plain_$nlist"
      val (tWrite, f1) =
        if (nlist <= 1024) {
          val (t, _) = time(
            rows.write.partitionBy("cell").mode("overwrite").parquet(p1))
          (t, countFiles(p1))
        } else (-1.0, -1)
      // the write, pre-shuffled by cell (one file per cell target shape)
      val p2 = s"$scratch/idx_shuf_$nlist"
      val (tWriteShuf, _) = time(
        rows.repartition(col("cell"))
          .write.partitionBy("cell").mode("overwrite").parquet(p2))
      val f2 = countFiles(p2)
      // occupancy read-back over each layout
      val (tOcc1, _) =
        if (nlist <= 1024) time(
          spark.read.parquet(p1).groupBy(col("cell"))
            .agg(count(lit(1)).as("n")).collect())
        else (-1.0, ())
      val (tOcc2, _) = time(
        spark.read.parquet(p2).groupBy(col("cell"))
          .agg(count(lit(1)).as("n")).collect())
      println(f"BUILDCOST dir=$tag nlist=$nlist sample=$sample " +
        f"encode=$tEncode%.2f " +
        f"write_plain=$tWrite%.2f files_plain=$f1 " +
        f"write_shuf=$tWriteShuf%.2f files_shuf=$f2 " +
        f"occ_plain=$tOcc1%.2f occ_shuf=$tOcc2%.2f")
    }
    spark.stop()
  }
}
