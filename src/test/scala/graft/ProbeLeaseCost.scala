package graft

import graft.operators.Pq
import graft.sources.BuildLock
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): price the cross-JVM build lease on the
  * LIVE grow legs (r16 verdict "what's wrong" #2 / next #3) — the three
  * numbers an operator needs before deploying StreamAnnGrow/StreamBm25Grow
  * at a production trigger cadence:
  *
  *  (a) bare lease cycle (create-excl claim + read-back + renewer
  *      schedule + token-checked delete) amortized over N empty bodies —
  *      the per-micro-batch overhead the lease ADDS to growBatch;
  *  (b) end-to-end growBatch wall for a small (200-row) micro-batch
  *      against a grown index — the floor a trigger interval must clear;
  *  (c) blocked-behind-rebuild: a micro-batch arriving while
  *      rebuildIfDrifted holds the lease waits the WHOLE rebuild out
  *      (foreachBatch is serial) — measured as the blocked append's wall
  *      vs its unblocked twin, next to the rebuild's own wall;
  *  (d) two-producer convoy: mb- and day- producers appending
  *      back-to-back on one artifact as fast as they can — per-batch
  *      wall p50/p95 vs the single-producer baseline.
  *
  *   tools/runjava.sh -cp target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/'*' \
  *     graft.ProbeLeaseCost
  */
object ProbeLeaseCost {

  private def ms[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e6, r)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val scratch = java.nio.file.Files.createTempDirectory("leasecost").toString

    def vecs(lo: Long, hi: Long) = (lo until hi).map { i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")

    // micro-batches draw sequential 200-id tranches above the base
    var nextId = 20000L
    def nextBatch() = {
      val lo = nextId; nextId += 200
      vecs(lo, nextId).localCheckpoint(false)
    }

    // ---- (a) bare lease cycle, N empty bodies ----
    val lockTarget = s"$scratch/bare"
    val n = 200
    (1 to 20).foreach(_ => BuildLock.withLease(spark, lockTarget, "warm") {}) // warm
    val (bareMs, _) = ms {
      (1 to n).foreach(_ => BuildLock.withLease(spark, lockTarget, "bare") {})
    }
    println(f"LEASECOST bare-cycle n=$n total=${bareMs}%.1fms per-op=${bareMs / n}%.3fms")

    // ---- (b) growBatch wall, 200-row micro-batches onto a grown index ----
    val idx = s"$scratch/idx"
    Pq.appendBatch(spark, vecs(0, 20000).localCheckpoint(), "vec_id",
      "embedding", idx, 0L, nlist = 32, m = 4, k = 16, namespace = "day")
    val batchWalls = (1 to 10).map { b =>
      val batch = nextBatch()
      val (w, applied) = ms {
        graft.streaming.StreamAnnGrow.growBatch(
          spark, batch, "vec_id", "embedding", idx, b.toLong,
          nlist = 32, m = 4, k = 16)
      }
      assert(applied == 200L)
      w
    }
    val sortedW = batchWalls.sorted
    println(f"LEASECOST growBatch-200rows p50=${sortedW(4)}%.0fms " +
      f"p90=${sortedW(8)}%.0fms min=${sortedW.head}%.0fms " +
      f"(lease share=${bareMs / n}%.1fms)")

    // ---- (c) blocked-behind-rebuild ----
    val (freeW, freeA) = ms {
      graft.streaming.StreamAnnGrow.growBatch(
        spark, nextBatch(), "vec_id", "embedding", idx, 100L,
        nlist = 32, m = 4, k = 16)
    }
    assert(freeA == 200L)
    // union corpus = full vectors of exactly what the index holds, built
    // by-name under the rebuild lease (the production posture)
    def union = vecs(0, nextId).join(
      spark.read.parquet(idx).select(col("id").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val rebuildStarted = new java.util.concurrent.CountDownLatch(1)
    val rebuildF = pool.submit(new java.util.concurrent.Callable[Double] {
      def call(): Double = {
        rebuildStarted.countDown()
        val (w, fired) = ms {
          Pq.rebuildIfDrifted(spark, idx, union, "vec_id", "embedding",
            nlist = 32, m = 4, k = 16, maxSkewGrowth = 1.0, maxGrowth = 1.0)
        }
        assert(fired, "rebuild was expected to fire (thresholds 1.0)")
        w
      }
    })
    rebuildStarted.await()
    Thread.sleep(300) // let the rebuild take the lease first
    val (blockedW, appliedB) = ms {
      graft.streaming.StreamAnnGrow.growBatch(
        spark, nextBatch(), "vec_id", "embedding", idx, 101L,
        nlist = 32, m = 4, k = 16)
    }
    val rebuildW = rebuildF.get()
    assert(appliedB == 200L)
    println(f"LEASECOST blocked-behind-rebuild rebuild=${rebuildW}%.0fms " +
      f"blocked-append=${blockedW}%.0fms unblocked-append=${freeW}%.0fms " +
      f"added-latency=${blockedW - freeW}%.0fms")

    // ---- (d) two-producer convoy, 15 batches each, back-to-back ----
    // pre-carve each producer's tranches so the convoy threads don't race
    // the id counter
    def tranches(k: Int): Seq[org.apache.spark.sql.DataFrame] =
      (0 until k).map(_ => nextBatch())
    def producer(ns: String, batches: Seq[org.apache.spark.sql.DataFrame],
        firstBatch: Long): Seq[Double] =
      batches.zipWithIndex.map { case (batch, i) =>
        val (w, a) = ms {
          Pq.appendBatch(spark, batch, "vec_id", "embedding", idx,
            firstBatch + i, nlist = 32, m = 4, k = 16, namespace = ns)
        }
        assert(a == 200L, s"$ns batch $i applied $a")
        w
      }
    val soloWalls = producer("mb", tranches(15), 200L) // single-producer baseline
    val mbT = tranches(15)
    val dayT = tranches(15)
    val fm = pool.submit(new java.util.concurrent.Callable[Seq[Double]] {
      def call(): Seq[Double] = producer("mb", mbT, 300L)
    })
    val fd = pool.submit(new java.util.concurrent.Callable[Seq[Double]] {
      def call(): Seq[Double] = producer("day", dayT, 300L)
    })
    val convoyWalls = (fm.get() ++ fd.get()).sorted
    val solo = soloWalls.sorted
    println(f"LEASECOST convoy solo-p50=${solo(7)}%.0fms solo-p95=${solo(13)}%.0fms " +
      f"convoy-p50=${convoyWalls(14)}%.0fms convoy-p95=${convoyWalls(28)}%.0fms " +
      f"(30 batches, 2 producers)")
    pool.shutdownNow()
    spark.stop()
  }
}
