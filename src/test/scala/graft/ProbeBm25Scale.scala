package graft

import org.apache.spark.sql.functions._

/** Scratch probe (test scope): the q82b posting index's scale evidence
  * (r11 verdict #6) over the media decade corpora —
  *   1. BUILD decade: writeIndex wall + posting-shuffle volume at
  *      5k/50k/500k docs (linear is the claim: one (term, doc) agg).
  *   2. PROBE flat: retrieveIndexed wall across the three index sizes
  *      for the same T-term query, with the files/partitions the scan
  *      actually opened (≤ T buckets is the claim, asserted at 500k).
  *   3. GROW equality at 500k: the corpus appended in 10 slices via
  *      appendBatch == one fresh build, probe for probe (df is
  *      probe-time, posting rows stateless — the exactness claim,
  *      measured at scale, not just the unit corpus).
  */
object ProbeBm25Scale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("/root/repo/gen/media0.1", "/root/repo/gen/media1", "/root/repo/gen/media10")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // terms from the corpus's own vocabulary (gen corpora are 31-word
    // synthetic vocab — DefaultQuery's TPC-H terms don't occur): the 3
    // most frequent first-tokens, a stable cross-dir choice
    def termsOf(dir: String): Seq[String] =
      graft.sources.Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("t"))
        .groupBy("t").count().orderBy(desc("count"), asc("t"))
        .limit(3).select("t").as[String].collect().toSeq

    val scratch = java.nio.file.Files.createTempDirectory("bm25_scale").toString
    val terms = termsOf(dirs.last)
    println(s"PROBE terms=${terms.mkString(",")}")

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // 1+2: build each decade, probe each index reps times
    val handles = dirs.map { dir =>
      val docs = graft.sources.Tables.documents(spark, dir)
      val n = docs.count()
      val path = s"$scratch/${dir.split('/').last}/idx"
      val (bSec, idx) = time(graft.operators.Bm25.writeIndex(docs, path))
      println(f"PROBE build dir=$dir docs=$n sec=$bSec%.2f postings=" +
        spark.read.parquet(path).count())
      (dir, idx)
    }
    handles.foreach { case (dir, idx) =>
      val secs = (1 to reps).map { _ =>
        time(graft.operators.Bm25.retrieveIndexed(idx, spark, terms = terms)
          .write.format("noop").mode("overwrite").save())._1
      }
      // what the probe scan opened: partitions + files of the pruned scan
      val probe = graft.operators.Bm25.retrieveIndexed(idx, spark, terms = terms)
      probe.write.format("noop").mode("overwrite").save()
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ => p.children.flatMap(walk)
      })
      val scans = walk(probe.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("bm25_scale")) => f
      }
      val parts = scans.map(_.selectedPartitions.partitionCount)
      val files = scans.map(_.selectedPartitions.totalNumberOfFiles)
      println(f"PROBE probe dir=$dir sec_min=${secs.min}%.3f secs=${secs.map(s => f"$s%.2f").mkString(",")} " +
        s"scanPartitions=${parts.mkString(",")} scanFiles=${files.mkString(",")} (terms=${terms.size})")
      assert(parts.forall(_ <= terms.size),
        s"probe must open <= T=${terms.size} buckets, opened $parts")
    }

    // 3: grow equality at the biggest scale — 10 appendBatch slices
    val bigDir = dirs.last
    val docs = graft.sources.Tables.documents(spark, bigDir)
    val growPath = s"$scratch/grow/idx"
    val (gSec, _) = time {
      (0 until 10).foreach { s =>
        graft.operators.Bm25.appendBatch(
          spark, docs.filter(pmod(col("doc_id"), lit(10)) === s),
          growPath, batchId = s.toLong)
      }
    }
    val grown = graft.operators.Bm25.readIndex(spark, growPath)
    val fresh = handles.last._2
    def res(i: graft.operators.Bm25.Bm25Index) =
      graft.operators.Bm25.retrieveIndexed(i, spark, terms = terms)
        .collect().map(_.toString).toSet
    val equal = res(grown) == res(fresh)
    println(f"PROBE grow sec_total=$gSec%.2f slices=10 grownN=${grown.n} freshN=${fresh.n} probesEqual=$equal")
    assert(equal, "10-append grown index must probe identically to the fresh build")
    spark.stop()
  }
}
