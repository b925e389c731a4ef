package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling for training-data pipelines (SURVEY §2
  * `q35_stratified_sample`).
  *
  * `df.sample()` is nondeterministic across runs/partitionings, which
  * makes training corpora unreproducible. This samples by ranking rows
  * inside each stratum on a SPLITMIX-style arithmetic hash of the row id —
  * pure integer math, so the exact same rows are chosen on any engine,
  * any partitioning, any day. One shuffle (the per-stratum window).
  *
  * At 100 TB scale note: an exact-N-per-stratum sample needs the
  * per-stratum sort a window provides; when an approximate fraction is
  * enough, `hashFraction` filters on the hash alone — no shuffle at all.
  */
object Sampling {

  /** 64-bit multiplicative mix kept within Long range via modular
    * arithmetic that DuckDB reproduces exactly: (id * PRIME_A + PRIME_B)
    * mod 2^31-1. Positive, uniform enough for sampling.
    */
  val HashMod: Long = 2147483647L // 2^31 - 1 (Mersenne prime)
  val HashMulA: Long = 1103515245L
  val HashAddB: Long = 12345L
  def idHash(id: Column): Column =
    pmod(id.cast("long") * HashMulA + HashAddB, lit(HashMod))

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by hash order with id tie-break.
    */
  def stratifiedN(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(idHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Shuffle-free approximate fraction: keeps rows whose id-hash falls
    * under fraction × HashMod. Deterministic; expected fraction per
    * stratum without grouping.
    */
  def hashFraction(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(idHash(col(idCol)) < lit((fraction * HashMod).toLong))
  }
}
