package graft.operators

import graft.plans.VectorFunctions
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}

/** Scored candidate for top-k aggregation. */
case class Scored(id: Long, score: Double)

/** Bounded top-k typed Aggregator: keeps the k best (score desc, id asc)
  * per group with map-side partial aggregation — each partition contributes
  * at most k candidates to the shuffle instead of its whole scored slice.
  * This is what makes brute-force kNN scan-shaped at 100 TB: the corpus is
  * read once, scored in place, and only O(k × partitions) rows move.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Long]] {
  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    insert(buf, in)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[Scored], in: Scored): Seq[Scored] = {
    val merged = (buf :+ in).sortWith(better)
    if (merged.size > k) merged.take(k) else merged
  }

  override def finish(buf: Seq[Scored]): Seq[Long] = buf.map(_.id)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Similarity search over an embedding column (SURVEY §2 q25/q26). */
object Knn {

  /** Brute-force cosine top-k: every query is scored against the whole
    * corpus with the codegen'd [[graft.plans.CosineSimilarity]] kernel.
    * The (small) query set is broadcast; the corpus is scanned exactly
    * once; the [[TopKAggregator]] keeps the shuffle at O(k) rows per
    * query per partition. Returns (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])

    val scored = c.join(broadcast(q), col("id") =!= col("qid"))
      .select(
        col("qid"), col("id"),
        VectorFunctions.cosineSimilarity(col("v"), col("qv")).as("score"))

    scored
      .groupBy("qid")
      .agg(topk(col("id"), col("score")).as("ids"))
      .select(col("qid").as("query_id"), posexplode(col("ids")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"), col("neighbor_id"))
  }

  /** Random-hyperplane LSH ANN — the 100 TB scale path. The corpus is
    * hashed once into 16-bit sign buckets; queries probe their own bucket
    * plus all hamming-1 neighbors (multi-probe) and rank only those
    * candidates. Recall is approximate by construction (rows-only oracle).
    * Returns (query_id, rank, neighbor_id).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val bucket = graft.plans.VectorFunctions.lshBucket16 _
    val c = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"), bucket(col(vecCol)).as("bucket"))
    val probes = queries.select(
      col(idCol).as("qid"), col(vecCol).as("qv"), bucket(col(vecCol)).as("qb"))
      .select(col("qid"), col("qv"),
        explode(array((-1 to 15).map {
          case -1 => col("qb")
          case b  => col("qb").bitwiseXOR(lit(1 << b))
        }: _*)).as("bucket"))

    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    c.join(broadcast(probes), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSimilarity(col("v"), col("qv")).as("score"))
      .groupBy("qid")
      .agg(topk(col("id"), col("score")).as("ids"))
      .select(col("qid").as("query_id"), posexplode(col("ids")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"), col("neighbor_id"))
  }
}
