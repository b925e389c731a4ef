package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 retrieval (SURVEY §2 q82) — the ranking function between q42's raw
  * TF-IDF weights and q63's pairwise cosine: given a bag-of-terms query,
  * score every document with Okapi BM25 and keep the top k per language.
  *
  * Shape, not formula, is what matters at 100 TB:
  *   - per-document term frequencies come from codegen'd array HOFs
  *     (`size(filter(toks, _ = t))`) over the split column — NO explode, so
  *     the corpus never fans out to a token table and nothing shuffles to
  *     compute tf;
  *   - the collection statistics (N, total tokens, per-term document
  *     frequencies) are ONE tiny aggregation producing a single row that
  *     broadcast-joins back — the idf constants ride the closure, not a
  *     shuffle;
  *   - top-k per language uses the q10 `BoundedTopK` aggregator: at most k
  *     rows leave each partition per language and nothing sorts.
  * The narrow (id, lang, dl, tf…) frame is materialized once and feeds both
  * the stats pass and the scoring pass (the q63 single-scan discipline; at
  * petabyte scale swapping the checkpoint for a second pruned parquet scan
  * is a config choice, not a redesign).
  *
  * Cross-engine fidelity: the score is pure double arithmetic + `ln`, with
  * every operation written in the same order as the DuckDB twin, rounded to
  * 4 dp (the q61 ln discipline) BEFORE ranking; ties break on doc_id, so
  * the ranking is engine-independent even where two docs round together.
  * Reference trace: the mandate's similarity-search family; formula is
  * Robertson–Spärck Jones BM25 (k1=1.2, b=0.75).
  */
object Bm25 {

  /** Default query — three corpus terms spanning the df range. */
  val DefaultQuery: Seq[String] = Seq("spark", "vector", "customer")

  def retrieve(
      docs: DataFrame,
      terms: Seq[String] = DefaultQuery,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "bounded query term list")
    val tfCols = terms.indices.map(i => s"tf$i")

    // one narrow pass: doc id, lang, doc length, one tf column per term
    val base = docs
      .filter(col("text").isNotNull)
      .select(
        Seq(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("dl")) ++
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(split(col("text"), " "), x => x === lit(t)))
              .cast("long").as(s"tf$i")
          }: _*)
      .localCheckpoint()

    // collection stats: a single row (N, total tokens, df per term)
    val statCols = Seq(count(lit(1)).as("n"), sum(col("dl")).as("tt")) ++
      tfCols.map(c => sum(when(col(c) > 0, 1L).otherwise(0L)).as(s"df_$c"))
    val stats = base.agg(statCols.head, statCols.tail: _*)

    // score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1-b+b*dl*N/tt)),
    // written term-by-term left to right exactly like the SQL twin
    val score = tfCols
      .map { c =>
        val idf = log(lit(1.0) + (col("n") - col(s"df_$c") + lit(0.5)) / (col(s"df_$c") + lit(0.5)))
        idf * (col(c) * lit(k1 + 1.0)) /
          (col(c) + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") * col("n") / col("tt")))
      }
      .reduce(_ + _)

    val scored = base
      .join(broadcast(stats))
      .filter(tfCols.map(col(_)).reduce(_ + _) > 0)
      .select(col("lang"), col("doc_id"), round(score, 4).as("bm25"))

    // bounded top-k per language on the ROUNDED score, doc_id tiebreak
    val topk = udaf(
      new BoundedTopK[(Double, Long)](k)((a, x) =>
        a._1 > x._1 || (a._1 == x._1 && a._2 < x._2)),
      org.apache.spark.sql.Encoders.product[(Double, Long)])
    scored
      .groupBy(col("lang"))
      .agg(topk(col("bm25"), col("doc_id")).as("w"))
      .select(col("lang"), posexplode(col("w")).as(Seq("pos", "x")))
      .select(
        col("lang"),
        col("x._2").as("doc_id"),
        col("x._1").as("bm25"),
        (col("pos") + 1).cast("int").as("rk"))
  }
}
