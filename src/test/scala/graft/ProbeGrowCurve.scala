package graft

import graft.operators.{Bm25, Pq}
import graft.sources.Compaction
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): one decade of SUSTAINED grow-leg
  * throughput (r16 verdict next #4). The grow legs' scaladoc claims
  * "cost is O(|batch|), independent of index size" — this turns the
  * claim into a curve: drive 50 micro-batches through each leg
  * (StreamAnnGrow's protocol for the IVF-PQ index, StreamBm25Grow's for
  * the posting index), recording per-batch wall and the index's data
  * file count after every batch, with the nightly compaction leg firing
  * every 10 batches. Expected shape: batch wall FLAT as the index grows
  * (the last batches no slower than the first), file count a SAWTOOTH
  * (linear growth between compactions, bounded at each).
  *
  *   tools/runjava.sh -cp target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/'*' \
  *     graft.ProbeGrowCurve [nBatches]
  */
object ProbeGrowCurve {

  private def ms[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e6, r)
  }

  private def dataFiles(root: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory)
        Option(f.listFiles).toSeq.flatten
          .filterNot(x => x.getName.startsWith("_") || x.getName.startsWith("."))
          .map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(root))
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(50)
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val scratch = java.nio.file.Files.createTempDirectory("growcurve").toString

    // ---- ANN leg: 20k-vector day-one base, 1000-vector micro-batches ----
    def vecs(lo: Long, hi: Long) = (lo until hi).map { i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val annIdx = s"$scratch/ann"
    Pq.appendBatch(spark, vecs(0, 20000).localCheckpoint(), "vec_id",
      "embedding", annIdx, 0L, nlist = 32, m = 4, k = 16, namespace = "day")
    println(s"GROWCURVE ann base rows=20000 files=${dataFiles(annIdx)}")
    (1 to nBatches).foreach { b =>
      val lo = 100000L + (b - 1) * 1000L
      val batch = vecs(lo, lo + 1000L).localCheckpoint(false)
      val (w, applied) = ms {
        graft.streaming.StreamAnnGrow.growBatch(spark, batch, "vec_id",
          "embedding", annIdx, b.toLong, nlist = 32, m = 4, k = 16)
      }
      assert(applied == 1000L)
      val compacted = if (b % 10 == 0) {
        val (cw, done) = ms {
          Compaction.compact(spark, annIdx, "cell",
            maxFiles = 1, smallFileBytes = Long.MaxValue / 4)
        }
        f" compact=${done.size}parts/${cw}%.0fms"
      } else ""
      println(f"GROWCURVE ann batch=$b%02d rows=${20000 + b * 1000} " +
        f"wall=${w}%.0fms files=${dataFiles(annIdx)}$compacted")
    }

    // ---- BM25 leg: 10k-doc day-one base, 500-doc micro-batches ----
    val words = Array("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "spark",
      "vector", "customer", "november", "oscar", "papa", "quebec")
    def docs(lo: Long, hi: Long) = (lo until hi).map { i =>
      val t = (0 until 12).map(j => words(((i * 13 + j * 7) % words.length).toInt))
        .mkString(" ")
      (i, t, if (i % 5 == 0) "de" else "en")
    }.toDF("doc_id", "text", "lang")
    val bmIdx = s"$scratch/bm25"
    Bm25.appendBatch(spark, docs(0, 10000).localCheckpoint(), bmIdx, 0L,
      buckets = 32, namespace = "day")
    println(s"GROWCURVE bm25 base docs=10000 files=${dataFiles(bmIdx)}")
    (1 to nBatches).foreach { b =>
      val lo = 100000L + (b - 1) * 500L
      val batch = docs(lo, lo + 500L).localCheckpoint(false)
      val (w, applied) = ms {
        graft.streaming.StreamBm25Grow.growBatch(spark, batch, bmIdx,
          b.toLong, buckets = 32)
      }
      assert(applied == 500L)
      val compacted = if (b % 10 == 0) {
        val (cw, done) = ms {
          Compaction.compact(spark, bmIdx, "pb",
            maxFiles = 1, smallFileBytes = Long.MaxValue / 4)
        }
        f" compact=${done.size}parts/${cw}%.0fms"
      } else ""
      println(f"GROWCURVE bm25 batch=$b%02d docs=${10000 + b * 500} " +
        f"wall=${w}%.0fms files=${dataFiles(bmIdx)}$compacted")
    }
    spark.stop()
  }
}
