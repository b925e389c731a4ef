package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter bitset builder: a mergeable typed Aggregator over
  * PRE-HASHED keys. Input is (h1, h2) — both produced by Spark's native
  * `xxhash64` on the build side, so the probe side can recompute the
  * exact same hashes natively (no Scala hash function has to match a
  * Catalyst one). Bit positions follow Kirsch–Mitzenmacher:
  * pos_i = (h1 + i·h2) mod numBits, i < k.
  */
class BloomAgg(numBits: Int, k: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] with Serializable {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    "numBits must be a power of two >= 64")
  require(k > 0)

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
    // hashes are masked to 32 bits so (h1 + i·h2) stays far below Long
    // range — the probe side recomputes this in ANSI SQL, where wrapping
    // overflow would throw instead of wrapping
    val h1 = in._1 & 0xFFFFFFFFL
    val h2 = in._2 & 0xFFFFFFFFL
    var i = 0
    while (i < k) {
      val pos = ((h1 + i.toLong * h2) & (numBits - 1).toLong).toInt
      b(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** Semi-join reduction via a Bloom filter — the runtime-filter pattern
  * that makes `fact ⋈ σ(dim)` cheap at 100 TB: instead of shuffling the
  * whole fact table into the join, build a compact bitset of the dim's
  * join keys (one distributed aggregation; partial bitsets OR-merge), ship
  * it to every fact task, and drop non-matching fact rows AT THE SCAN —
  * before any exchange. False positives pass (the join still removes
  * them); false negatives are impossible, so the join result is unchanged.
  *
  * The driver-side collect of the finished bitset is DELIBERATE and
  * bounded (numBits/8 bytes — 16 KB at 2^17, 128 KB at 2^20), the same
  * contract as IvfKnn's sampled k-means training: a small model built
  * distributed, then broadcast into a scan-side predicate.
  *
  * The probe is pure native SQL (xxhash64 + element_at + shiftright +
  * bitwise and) — whole-stage-codegen'd, no UDF on the 100 TB side.
  */
object Bloom {

  /** Second-hash seed; any fixed literal works — it only has to be the
    * same on build and probe.
    */
  val Seed = 0x9E3779B9L

  private def hashes(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(Seed)))

  /** Distributed build over `keys(keyCol)` → the finished bitset. */
  def build(
      keys: DataFrame, keyCol: String,
      numBits: Int = 1 << 20, k: Int = 5): Array[Long] = {
    val agg = udaf(new BloomAgg(numBits, k), Encoders.product[(Long, Long)])
    val (h1, h2) = hashes(col(keyCol))
    keys
      .select(h1.as("h1"), h2.as("h2"))
      .agg(agg(col("h1"), col("h2")).as("bloom"))
      .head().getSeq[Long](0).toArray
  }

  /** `fact` rows whose `factKey` might be in the filter (all true members
    * pass; false positives pass at the configured rate). `numBits`/`k`
    * must match [[build]].
    */
  def prefilter(
      fact: DataFrame, factKey: String, bloom: Array[Long],
      numBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    require(bloom.length == numBits / 64, "bloom/numBits mismatch")
    val (h1, h2) = hashes(col(factKey))
    var df = fact
      .withColumn("__bh1", h1.bitwiseAND(lit(0xFFFFFFFFL)))
      .withColumn("__bh2", h2.bitwiseAND(lit(0xFFFFFFFFL)))
      .withColumn("__bloom", lit(bloom))
    val preds = (0 until k).map { i =>
      df = df.withColumn(s"__bp$i",
        (col("__bh1") + lit(i.toLong) * col("__bh2"))
          .bitwiseAND(lit((numBits - 1).toLong)))
      // variable-distance shifts exist at the SQL level only (the Scala
      // Column API pins the distance to an Int literal)
      s"((shiftright(element_at(__bloom, cast(shiftright(__bp$i, 6) as int) + 1), " +
        s"cast(__bp$i % 64 as int)) & 1) = 1)"
    }
    df.filter(expr(preds.mkString(" AND ")))
      .drop("__bh1" :: "__bh2" :: "__bloom" :: (0 until k).map(i => s"__bp$i").toList: _*)
  }

  /** Driver-checkable gate (q44/q17 pattern): builds the filter from one
    * table's keys, prefilters the other, and emits ONE row an exact-SQL
    * oracle reproduces:
    *   n_exact — the true semi-join count (oracle-recomputed);
    *   no_false_negatives — every true match passed the filter
    *     (structural guarantee of a correct Bloom filter, asserted);
    *   fp_ok — passed-but-false rows ≤ 2× the theoretical rate
    *     (1 − e^(−k·n/m))^k of the non-matching population, +8 slack for
    *     small-sample noise.
    */
  def semiJoinGate(
      fact: DataFrame, factKey: String,
      dimKeys: DataFrame, dimKey: String,
      numBits: Int = 1 << 17, k: Int = 5): DataFrame = {
    val bloom = build(dimKeys, dimKey, numBits, k)
    val passed = prefilter(fact, factKey, bloom, numBits, k)
    val exact = fact.join(
      dimKeys.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")

    val nKeys = dimKeys.select(col(dimKey)).distinct().count()
    val fpRate = math.pow(1 - math.exp(-k.toDouble * nKeys / numBits), k)

    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val nPassed = passed.agg(count(lit(1)).as("n_passed"))
    val nTotal = fact.agg(count(lit(1)).as("n_total"))
    val nMissed = exact
      .join(passed.select(col(factKey).as("__pk")), col(factKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    nExact.crossJoin(nPassed).crossJoin(nTotal).crossJoin(nMissed)
      .select(
        col("n_exact"),
        (col("n_missed") === 0).as("no_false_negatives"),
        ((col("n_passed") - col("n_exact"))
          <= (col("n_total") - col("n_exact")) * (2 * fpRate) + 8).as("fp_ok"))
  }
}
