package graft

import graft.operators.IvfKnn

/** Scratch probe (test scope): the distributed coarse trainer one decade
  * past SCALING_r15 §2 (r15 verdict #5). The r15 table stops at
  * nlist=4096 (31 s, on a 200k-vector corpus whose thinning was already
  * exhausted); this measures nlist=16384 — sample target ~524k vectors —
  * over a synthetic 1M-vector corpus (GenData.embeddings, hash-seeded,
  * no disk corpus needed), timing the sample build and EACH Lloyd
  * iteration separately so the scaling exponent is measured rather than
  * assumed: per-iteration work is O(sample × nlist × d) and
  * sample ≈ 32 × nlist, so the per-iteration wall should grow ~16× per
  * nlist decade (quadratic in nlist) while the driver's state stays the
  * model: the per-iteration collect is nlist rows × (d+2) columns —
  * printed in rows and estimated bytes, the documented
  * bounded-model-collect contract, with the nlist=65 536 projection.
  *
  *   tools/runjava.sh -cp target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/'*' \
  *     graft.ProbeTrainerDecade 1000000 16384 3
  */
object ProbeTrainerDecade {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toLong else 1000000L
    val nlist = if (args.length > 1) args(1).toInt else 16384
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // synthetic corpus: 64-dim hash-seeded gaussians (the near-uniform
    // IVF worst case, the same generator behind the sf embeddings)
    val emb = GenData.embeddings(spark, nVecs).localCheckpoint()
    println(s"TRAINDECADE corpus n=${emb.count()} d=64 nlist=$nlist " +
      s"sampleTarget=${nlist * 32}")

    // iters=0 isolates the SAMPLE build (thinning scan + normalize +
    // checkpoint + pinned init); each extra iter adds one assign+agg
    val (tSample, _) = time(
      IvfKnn.trainCentroidsAtScale(emb, "vec_id", "embedding", nlist, iters = 0))
    println(f"TRAINDECADE sample nlist=$nlist sec=$tSample%.1f")
    var prev = tSample
    for (it <- 1 to iters) {
      val (t, c) = time(
        IvfKnn.trainCentroidsAtScale(emb, "vec_id", "embedding", nlist, iters = it))
      println(f"TRAINDECADE iters=$it nlist=$nlist sec=$t%.1f " +
        f"perIter=${t - prev}%.1f centroids=${c.length}")
      prev = t
    }
    // the model collect: nlist rows × (1 int cell + 1 long cnt + 64 long
    // sums) ≈ nlist × 530 B of driver heap per iteration — print the
    // measured row count and the 65k-cell projection
    val rowBytes = 4 + 8 + 64 * 8 + 16 // fields + Row overhead estimate
    println(s"TRAINDECADE collect rows=$nlist bytes~${nlist * rowBytes} " +
      s"at65k rows=65536 bytes~${65536L * rowBytes}")
    spark.stop()
  }
}
