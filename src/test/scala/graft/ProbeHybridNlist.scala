package graft

import graft.operators.{Bm25, HybridRetrieval, Pq}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): the hybrid dense leg's cell pruning at a
  * PRODUCTION-shaped nlist (r13 verdict #6). SCALING_r13 §3's
  * "cells opened ≤ queries × nprobe" assertion never bound — at
  * nlist=32, 10 near-uniform queries × nprobe 8 cover every cell, so the
  * hybrid path's pruning had q107b-level evidence only by analogy. This
  * probe builds the IVF-PQ index at nlist ≥ 256 over a rich-vocab
  * corpus and drives the PRODUCTION entry ([[HybridRetrieval.rrfFuseAnn]]
  * — ANN-only, no exact-dense leg) plus the gated registration,
  * asserting in-probe that the dense scan opens
  * cells ≤ queries × nprobe ≪ nlist.
  */
object ProbeHybridNlist {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/gen/rich10"
    val nlist = if (args.length > 1) args(1).toInt else 256
    // nprobe=0 (r16): derive from the production probe FRACTION
    // (HybridRetrieval.DefaultProbeFraction) — the fraction-held run
    // SCALING_r15 §4 called for
    val nprobeArg = if (args.length > 2) args(2).toInt else 8
    val nprobe = if (nprobeArg > 0) nprobeArg
      else HybridRetrieval.nprobeFor(nlist)
    val reps = if (args.length > 3) args(3).toInt else 2
    // PQ codes per subspace — the resolution knob (SCALING_r15 §4: at
    // production nlist the fused-overlap margin is code-resolution-bound,
    // not probe-bound; k=256 is the measurement behind that sentence)
    val pqK = if (args.length > 4) args(4).toInt else 32
    val nQueries = 10
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scratch = java.nio.file.Files.createTempDirectory("hyb_nlist").toString
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
    def cellScans(df: org.apache.spark.sql.DataFrame) =
      walk(df.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("hyb_dense_idx")) => f
      }

    val tag = dir.split('/').last
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val bmIdx = Bm25.writeIndex(docs, s"$scratch/bm25_idx")
    val corpus = emb.join(
      docs.filter(col("text").isNotNull)
        .select(col("doc_id").cast("long").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val pqPath = s"$scratch/hyb_dense_idx"
    val (bSec, _) = time(Pq.writeIndex(corpus, "vec_id", "embedding",
      Pq.train(corpus, "vec_id", "embedding", m = 8, k = pqK), pqPath,
      nlist = nlist))
    val pqIdx = Pq.readIndex(spark, pqPath)
    val cellsOnDisk = new java.io.File(pqPath).listFiles
      .count(_.getName.startsWith("cell="))
    println(f"HYBNLIST build dir=$tag nlist=$nlist cellsOnDisk=$cellsOnDisk sec=$bSec%.2f")

    // the PRODUCTION ANN-only probe (no exact-dense leg), timed
    val secs = (1 to reps).map { _ =>
      time(HybridRetrieval.rrfFuseAnn(docs, emb, bmIdx, pqIdx,
        nQueries = nQueries, nprobe = nprobe)
        .write.format("noop").mode("overwrite").save())._1
    }
    val probe = HybridRetrieval.rrfFuseAnn(docs, emb, bmIdx, pqIdx,
      nQueries = nQueries, nprobe = nprobe)
    probe.write.format("noop").mode("overwrite").save()
    val opened = cellScans(probe).map(_.selectedPartitions.partitionCount)
    println(f"HYBNLIST q85ann dir=$tag nlist=$nlist nprobe=$nprobe " +
      f"sec_min=${secs.min}%.2f secs=${secs.map(s => f"$s%.2f").mkString(",")} " +
      s"cellsOpened=${opened.mkString(",")} bound=${nQueries * nprobe}")
    // the binding assertion SCALING_r13 §3 could not make at nlist=32:
    // opened cells bounded by the query batch, NOT the index's cell count
    assert(opened.nonEmpty, "probe must scan the dense index")
    assert(opened.forall(_ <= nQueries * nprobe),
      s"dense scan must open <= queries*nprobe cells: $opened")
    // at fraction-scaled nprobe a 10-query near-uniform batch can
    // legitimately cover every cell (10 × 0.25 × nlist > nlist) — the
    // batch-level bound only BINDS when it is under the cell count
    if (nQueries * nprobe < cellsOnDisk)
      assert(opened.forall(_ < cellsOnDisk),
        s"the bound must BIND: opened $opened of $cellsOnDisk cells")

    // PER-QUERY prune — the quantity that scales (production queries are
    // independent; the batch union above is a toy-probe artifact): one
    // query opens ≤ nprobe of nlist cells however wide the fraction
    val one = HybridRetrieval.rrfFuseAnn(docs, emb, bmIdx, pqIdx,
      nQueries = 1, nprobe = nprobe)
    one.write.format("noop").mode("overwrite").save()
    val oneOpened = cellScans(one).map(_.selectedPartitions.partitionCount)
    println(s"HYBNLIST perquery dir=$tag nlist=$nlist nprobe=$nprobe " +
      s"cellsOpened=${oneOpened.mkString(",")} of $cellsOnDisk")
    assert(oneOpened.nonEmpty && oneOpened.forall(_ <= nprobe),
      s"a single query must open <= nprobe cells: $oneOpened")
    assert(oneOpened.forall(_ < cellsOnDisk),
      s"the per-query prune must bind: $oneOpened of $cellsOnDisk")

    // same-JVM A/B: the GATE probe (pays BOTH fused variants — its job)
    // against the production ANN-only probe timed above, interleaved so
    // box drift cannot masquerade as a difference
    val gsecs = (1 to reps).map { _ =>
      time(HybridRetrieval.rrfFuseAnnGate(docs, emb, bmIdx, pqIdx,
        nQueries = nQueries, nprobe = nprobe).collect())._1
    }
    println(f"HYBNLIST gateAB dir=$tag nlist=$nlist gate_min=${gsecs.min}%.2f " +
      f"ann_min=${secs.min}%.2f gate_secs=${gsecs.map(s => f"$s%.2f").mkString(",")}")

    // the gated registration's overlap at this nlist (reported, with the
    // gate verdict at the registered floor — calibration context, not a
    // pass/fail of this probe: the floor was calibrated at nlist=32)
    val (ann, exact) = HybridRetrieval.annFusedLists(
      docs, emb, bmIdx, pqIdx, nQueries = nQueries, legK = 20, termCap = 16,
      fuseK = 10, nprobe = nprobe, refine = 200, k1 = 1.2, b = 0.75,
      rrfK = 60.0)
    val exactC = exact.cache()
    val denom = exactC.count()
    val hits = exactC.join(ann, Seq("query_id", "neighbor_id"), "left_semi").count()
    println(s"HYBNLIST overlap dir=$tag nlist=$nlist nprobe=$nprobe: " +
      s"$hits / $denom = ${math.rint(1e4 * hits / denom) / 1e4}")
    exactC.unpersist()
    spark.stop()
  }
}
