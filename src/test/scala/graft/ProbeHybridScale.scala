package graft

import graft.operators.{Bm25, HybridRetrieval, Pq}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): the q85b/q85c probe-wall decades
  * (r12 verdict #7) over rich-vocabulary corpora (vocab 4096 — the
  * regime where idf-capping means something; the 31-word sf corpora make
  * every doc's vocabulary the whole dictionary). Per decade dir:
  *   1. build the BM25 posting index (timed, posting rows printed);
  *   2. probe q85b (`rrfFuseIndexed`) reps times — wall + the pb
  *      partitions each posting scan opened: the df pass is bounded by
  *      min(buckets, |query vocab|), the scoring pass by the CAPPED
  *      vocab (≤ nQueries × termCap) — both asserted in-probe;
  *   3. build the IVF-PQ dense index and probe q85c
  *      (`rrfFuseAnnGate`) — wall + the cell partitions the dense scan
  *      opened (≤ queries × nprobe), gate must be green.
  */
object ProbeHybridScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("/root/repo/gen/rich0.1", "/root/repo/gen/rich1", "/root/repo/gen/rich10")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val scratch = java.nio.file.Files.createTempDirectory("hyb_scale").toString
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case _ => p.children.flatMap(walk)
    })
    def scansOf(df: org.apache.spark.sql.DataFrame, pathTag: String) =
      walk(df.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(pathTag)) => f
      }

    for (dir <- dirs) {
      val tag = dir.split('/').last
      val docs = Tables.documents(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val nDocs = docs.count()

      // the capped-scan bound inputs: |query vocab| and the capped size
      val vocabN = docs
        .filter(col("text").isNotNull && col("doc_id") < 10)
        .select(explode(array_distinct(split(col("text"), " "))).as("t"))
        .select("t").distinct().count()

      val bmPath = s"$scratch/$tag/bm25_idx"
      val (bSec, bmIdx) = time(Bm25.writeIndex(docs, bmPath))
      val postings = spark.read.parquet(bmPath).count()
      println(f"HYBSCALE build dir=$tag docs=$nDocs vocabQ=$vocabN sec=$bSec%.2f postings=$postings")

      // q85b probe decades
      val secs = (1 to reps).map { _ =>
        time(HybridRetrieval.rrfFuseIndexed(docs, emb, bmIdx)
          .write.format("noop").mode("overwrite").save())._1
      }
      val probe = HybridRetrieval.rrfFuseIndexed(docs, emb, bmIdx)
      probe.write.format("noop").mode("overwrite").save()
      val parts = scansOf(probe, "bm25_idx").map(_.selectedPartitions.partitionCount).sorted
      println(f"HYBSCALE q85b dir=$tag sec_min=${secs.min}%.2f secs=${secs.map(s => f"$s%.2f").mkString(",")} " +
        s"scanPartitions=${parts.mkString(",")} (buckets=${bmIdx.buckets}, cappedMax=${10 * 16})")
      assert(parts.forall(_ <= math.min(bmIdx.buckets, vocabN)),
        s"df scan must open <= min(buckets, |vocab|) partitions: $parts")
      assert(parts.min <= 10 * 16,
        s"scoring scan must open <= capped-vocab buckets: $parts")

      // q85c probe decades (dense leg on the persisted IVF-PQ index)
      val corpus = emb.join(
        docs.filter(col("text").isNotNull)
          .select(col("doc_id").cast("long").as("vec_id")),
        Seq("vec_id"), "left_semi")
      val pqPath = s"$scratch/$tag/hyb_dense_idx"
      val (pSec, _) = time(Pq.writeIndex(corpus, "vec_id", "embedding",
        Pq.train(corpus, "vec_id", "embedding", m = 8, k = 32), pqPath, nlist = 32))
      val pqIdx = Pq.readIndex(spark, pqPath)
      val csecs = (1 to reps).map { _ =>
        time(HybridRetrieval.rrfFuseAnnGate(docs, emb, bmIdx, pqIdx)
          .write.format("noop").mode("overwrite").save())._1
      }
      val cprobe = HybridRetrieval.rrfFuseAnnGate(docs, emb, bmIdx, pqIdx)
      val crow = cprobe.collect().head
      val cells = scansOf(cprobe, "hyb_dense_idx").map(_.selectedPartitions.partitionCount)
      println(f"HYBSCALE q85c dir=$tag buildPq=$pSec%.2f sec_min=${csecs.min}%.2f " +
        s"secs=${csecs.map(s => f"$s%.2f").mkString(",")} denseCells=${cells.mkString(",")} " +
        s"gate=${crow.getAs[Boolean]("recall_ok")} nq=${crow.getAs[Long]("n_queries")}")
      assert(crow.getAs[Boolean]("recall_ok"), s"q85c gate red at $tag")
      assert(cells.forall(_ <= 10 * 8), s"dense scan must open <= queries*nprobe cells: $cells")
    }
    spark.stop()
  }
}
