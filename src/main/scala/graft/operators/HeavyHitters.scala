package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi 2005,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams") as a typed mergeable Aggregator — the one-pass scale path
  * for "top tokens over 100 TB of text", where the exact groupBy answer
  * (q36/q42 shape) needs a vocabulary-sized shuffle.
  *
  * Guarantees (standard SpaceSaving): with capacity m over N items,
  * true count ≤ estimate ≤ true count + `err` with err ≤ N/m, and every
  * item with true count > N/m is present. The summary is mergeable —
  * absent terms inherit the other side's eviction floor, preserving
  * the two-sided bound (see [[merge]]) — so one O(m) sketch per group
  * rides the shuffle, vs O(|vocabulary|) rows for the exact aggregate.
  */
class SpaceSaving(m: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]]
    with Serializable {
  require(m > 0, "capacity must be positive")

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(
      buf: Map[String, (Long, Long)], term: String): Map[String, (Long, Long)] =
    buf.get(term) match {
      case Some((c, e)) => buf.updated(term, (c + 1, e))
      case None if buf.size < m => buf.updated(term, (1L, 0L))
      case None =>
        // evict the min-count monitor; the newcomer inherits its count as
        // overestimate (it may have occurred up to minC times already)
        val (minT, (minC, _)) = buf.minBy { case (t, (c, _)) => (c, t) }
        (buf - minT).updated(term, (minC + 1, minC))
    }

  /** Mergeable-summaries merge (Berinde et al. 2010 / Agarwal et al.
    * 2012): a term absent from a FULL summary may still have occurred up
    * to that summary's eviction floor (its min count) times there, so the
    * absent side contributes (floor, floor) — keeping the invariant
    * estimate ≥ true count ≥ estimate − err. Then truncate back to the m
    * largest counts (dropping the tail costs containment slack, not the
    * per-term bound).
    */
  override def merge(
      a: Map[String, (Long, Long)],
      b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    def floor(s: Map[String, (Long, Long)]): Long =
      if (s.size < m) 0L else s.valuesIterator.map(_._1).min
    val (fa, fb) = (floor(a), floor(b))
    val summed = (a.keySet ++ b.keySet).iterator.map { t =>
      val (ca, ea) = a.getOrElse(t, (fa, fa))
      val (cb, eb) = b.getOrElse(t, (fb, fb))
      t -> (ca + cb, ea + eb)
    }.toMap
    if (summed.size <= m) summed
    else summed.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(m).toMap
  }

  /** (term, estimate, err) sorted by (estimate desc, term). */
  override def finish(buf: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    buf.toSeq.map { case (t, (c, e)) => (t, c, e) }
      .sortBy { case (t, c, _) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] = ExpressionEncoder()
}

object HeavyHitters {

  /** Driver-checkable gate for the sketch (q17/q26 pattern): the EXACT
    * global top-k tokens (recomputable by any SQL engine) are the output
    * spine, and two sketch properties ride along as booleans an oracle
    * asserts TRUE:
    *   sk_contains — the exact rank-`rk` term appears in the sketch's
    *     top `2k` (SpaceSaving's top-k containment, slackened ×2 for
    *     boundary ties);
    *   sk_est_ok — the sketch's estimate for that term is within
    *     [true, true + N/m] (the overestimate-only bound).
    * The exact reference is ONE extra aggregation over (term) — bounded
    * work; the operator's value at 100 TB is that the sketch path alone
    * never shuffles more than m rows per partition.
    */
  def topTokensGate(
      docs: DataFrame, textCol: String, k: Int = 3, m: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val terms = docs.select(
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))

    // exact reference: (term, occurrences) top-k through the bounded agg
    val topk = udaf(
      new BoundedTopK[(Long, String)](k)((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)),
      Encoders.product[(Long, String)])
    val exact = terms
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .agg(topk(col("c"), col("term")).as("w"), sum(col("c")).as("n_total"))
      .select(col("n_total"), posexplode(col("w")).as(Seq("pos", "x")))
      .select(
        (col("pos") + 1).cast("int").as("rk"),
        col("x._2").as("term"),
        col("x._1").as("occurrences"),
        col("n_total"))

    // sketch: one SpaceSaving summary over the whole stream
    val ss = udaf(new SpaceSaving(m), Encoders.STRING)
    val sketch = terms.agg(ss(col("term")).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e._1").as("sk_term"), col("e._2").as("sk_est"))
      // Constant partition key: the SpaceSaving summary holds <= m entries
      // by construction, so one-partition ranking is bounded — the dummy
      // key only silences WindowExec's single-partition scale warning.
      // (`sk_est * 0`, not `lit(0)`: a foldable key is pruned by the
      // optimizer and the partition spec goes back to empty.)
      .withColumn("sk_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("sk_est") * lit(0L))
          .orderBy(col("sk_est").desc, col("sk_term"))))
      .filter(col("sk_rank") <= 2 * k)

    exact
      .join(sketch, col("term") === col("sk_term"), "left")
      .select(
        col("rk"), col("term"), col("occurrences"),
        col("sk_term").isNotNull.as("sk_contains"),
        (col("sk_est").isNotNull &&
          col("sk_est") >= col("occurrences") &&
          col("sk_est") <= col("occurrences") + col("n_total") / m).as("sk_est_ok"))
  }
}
