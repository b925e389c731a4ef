package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Generic bounded top-k typed Aggregator: the [[TopKAggregator]] shape
  * (map-side partial aggregation, one-comparison reject when the buffer is
  * full) for ANY row type `I` under a caller-supplied strict ranking
  * `ranksBefore`.
  *
  * This is what replaces `row_number().over(Window.partitionBy(g).orderBy
  * (...)) <= k`: the window formulation shuffles and SORTS every row of
  * every group; this shuffles at most k rows per (group × input
  * partition) and sorts nothing — the buffer stays ordered by bounded
  * insert. At 100× the data the window's per-group sort is the bottleneck;
  * this stays O(k).
  *
  * `ranksBefore` must be a strict total order (irreflexive, transitive,
  * total via a unique tie-break key) — the same contract the window's
  * ORDER BY needed for deterministic ranks.
  */
class BoundedTopK[I: TypeTag](k: Int)(ranksBefore: (I, I) => Boolean)
    extends Aggregator[I, Seq[I], Seq[I]] with Serializable {
  require(k > 0, "k must be positive")

  override def zero: Seq[I] = Seq.empty

  override def reduce(buf: Seq[I], in: I): Seq[I] = insert(buf, in)

  override def merge(a: Seq[I], b: Seq[I]): Seq[I] = b.foldLeft(a)(insert)

  private def insert(buf: Seq[I], in: I): Seq[I] = {
    if (buf.size >= k && !ranksBefore(in, buf.last)) buf
    else {
      val at = buf.indexWhere(ranksBefore(in, _)) match {
        case -1 => buf.size
        case i  => i
      }
      val spliced = (buf.take(at) :+ in) ++ buf.drop(at)
      if (spliced.size > k) spliced.take(k) else spliced
    }
  }

  override def finish(buf: Seq[I]): Seq[I] = buf

  override def bufferEncoder: Encoder[Seq[I]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[I]] = ExpressionEncoder()
}
