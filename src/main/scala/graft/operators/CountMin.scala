package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable typed
  * Aggregator — point-frequency estimates over an unbounded key space in
  * O(d·w) memory. Complements [[SpaceSaving]] (which answers top-k;
  * Count-Min answers "how often did THIS key occur", including keys that
  * never made a top-k summary).
  *
  * Same distribution contract as [[BloomAgg]]: input is a PRE-HASHED
  * (h1, h2) pair from native `xxhash64`, masked to 32 bits so the row
  * index (h1 + j·h2) mod w is computable in ANSI SQL on the probe side
  * without overflow; partial sketches merge by elementwise sum (exactly
  * counts, since each occurrence increments every row once).
  *
  * Guarantees: estimate ≥ true count always (increments are never lost),
  * and estimate ≤ true + εN with probability 1 − δ for w = ⌈e/ε⌉,
  * d = ⌈ln 1/δ⌉.
  */
class CountMinAgg(w: Int, d: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] with Serializable {
  require(w >= 64 && (w & (w - 1)) == 0, "width must be a power of two >= 64")
  require(d > 0)

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
    val h1 = in._1 & 0xFFFFFFFFL
    val h2 = in._2 & 0xFFFFFFFFL
    var j = 0
    while (j < d) {
      b(j * w + ((h1 + j.toLong * h2) & (w - 1).toLong).toInt) += 1L
      j += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {

  /** Native point-estimate over a finished sketch carried in `sketchCol`:
    * min over the d rows of the counter each hash picks — pure
    * element_at/bitwise SQL, codegen'd, recomputing the exact hashes the
    * build side used.
    */
  def estimate(sketchCol: Column, key: Column, w: Int, d: Int): Column = {
    val h1 = xxhash64(key).bitwiseAND(lit(0xFFFFFFFFL))
    val h2 = xxhash64(key, lit(Bloom.Seed)).bitwiseAND(lit(0xFFFFFFFFL))
    val cells = (0 until d).map { j =>
      val idx = (h1 + lit(j.toLong) * h2).bitwiseAND(lit((w - 1).toLong))
      element_at(sketchCol, (lit(j * w) + idx).cast("int") + 1)
    }
    least(cells: _*)
  }

  /** Driver-checkable gate (q44 pattern): the exact top-k tokens + counts
    * are the oracle-recomputable spine; the sketch's point estimate for
    * each rides along as two booleans — `cm_lower_ok` (estimate ≥ true,
    * the structural one-sided guarantee) and `cm_err_ok` (overestimate
    * ≤ 4·N/w + 8 — well inside the εN bound for d ≥ 4, deterministic on
    * fixed data).
    */
  def topTokensGate(
      docs: DataFrame, textCol: String, k: Int = 3,
      w: Int = 2048, d: Int = 4): DataFrame = {
    val terms = docs.select(
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))

    val topk = udaf(
      new BoundedTopK[(Long, String)](k)((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)),
      Encoders.product[(Long, String)])
    val exact = terms
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .agg(topk(col("c"), col("term")).as("wn"), sum(col("c")).as("n_total"))
      .select(col("n_total"), posexplode(col("wn")).as(Seq("pos", "x")))
      .select(
        (col("pos") + 1).cast("int").as("rk"),
        col("x._2").as("term"),
        col("x._1").as("occurrences"),
        col("n_total"))

    val agg = udaf(new CountMinAgg(w, d), Encoders.product[(Long, Long)])
    val sketch = terms
      .select(
        xxhash64(col("term")).as("h1"),
        xxhash64(col("term"), lit(Bloom.Seed)).as("h2"))
      .agg(agg(col("h1"), col("h2")).as("cm"))

    val est = CountMin.estimate(col("cm"), col("term"), w, d)
    exact.crossJoin(sketch)
      .select(
        col("rk"), col("term"), col("occurrences"),
        (est >= col("occurrences")).as("cm_lower_ok"),
        (est <= col("occurrences") + lit(4) * col("n_total") / w + 8).as("cm_err_ok"))
  }
}
