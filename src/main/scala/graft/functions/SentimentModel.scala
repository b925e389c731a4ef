package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batch MODEL-INFERENCE surface for sentiment — the slot the reference
  * fills with a pretrained Spark NLP pipeline (`tweets.py:53-54`), re-
  * expressed as the Spark-native inference pattern: small model weights
  * broadcast once per job, scoring `mapPartitions`-batched over the
  * corpus (the [[graft.operators.Multimodal]] decode shape — real models
  * amortize per-call setup over a batch).
  *
  * The model itself is a linear bag-of-words classifier: margin =
  * bias + Σ weight(token)·count(token), label = sign of the margin with
  * an `na` dead zone. That is exactly a fitted logistic regression's
  * decision rule over token counts — a user drops in real trained
  * weights (AFINN-style `token<TAB>weight` lines, [[SentimentModel
  * .fromLines]]) without touching the plumbing, and
  * [[SentimentModel.fromLexicon]] reproduces the lexicon majority vote
  * (spec-asserted equal to [[TextFunctions.overallSentiment]]), so the
  * model path is a strict generalization of the column path.
  */
final case class SentimentModel(
    weights: Map[String, Double], bias: Double = 0.0, deadZone: Double = 0.0) {

  require(deadZone >= 0.0, "deadZone must be non-negative")

  /** Driver-side reference scorer (also the per-row kernel): the margin
    * of one tokenized document.
    */
  def margin(tokens: Iterable[String]): Double =
    bias + tokens.iterator.map(t => weights.getOrElse(t, 0.0)).sum

  /** Tri-state decision: margin above the dead zone → positive, below
    * its negation → negative, inside → na (no evidence is not positive).
    */
  def label(m: Double): String =
    if (m > deadZone) "positive" else if (m < -deadZone) "negative" else "na"

  def score(tokens: Iterable[String]): String = label(margin(tokens))
}

object SentimentModel {

  /** How many documents each scoring call receives (the Multimodal batch
    * contract: swap in a model server / ONNX session and the call shape
    * holds).
    */
  val ScoreBatchSize = 256

  /** The lexicon majority vote as a model: weight = valence. With AFINN's
    * integer valences, sign(Σ valence·count) generalizes the ±1 toy
    * lexicon's p-vs-n vote.
    */
  def fromLexicon(lex: Lexicon): SentimentModel =
    SentimentModel(lex.scores.map { case (w, s) => w -> s.toDouble })

  /** Parse `token<TAB>weight` lines (AFINN shape, real-valued weights;
    * the parser is [[Lexicon.parseTokenValueLines]]).
    */
  def fromLines(lines: Iterator[String]): SentimentModel =
    SentimentModel(Lexicon.parseTokenValueLines(lines)(_.toDouble))

  /** Score one BATCH of (id, text) rows — the call a model server / ONNX
    * session replaces: it receives the whole batch, exactly like
    * [[graft.operators.Multimodal.decode]].
    */
  def scoreBatch(
      m: SentimentModel, batch: Seq[(Long, String)]): Seq[(Long, Double, String)] =
    batch.map { case (id, text) =>
      // null text = no tokens: the margin is the bias alone (usually
      // "na"), never a crash and never a lost doc
      val toks = if (text == null) Seq.empty[String] else text.split(" ").toSeq
      val mg = m.margin(toks)
      (id, mg, m.label(mg))
    }

  /** Batch-scored corpus: `(id, margin, sentiment)` per document. The
    * weights ride ONE broadcast (not a per-task closure copy);
    * tokenization is [[TextFunctions.tokens]]' whitespace split, so
    * labels are comparable with the column path.
    */
  def scored(
      docs: DataFrame, idCol: String, textCol: String,
      model: SentimentModel,
      batchSize: Int = ScoreBatchSize): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val out: Dataset[(Long, Double, String)] = docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.grouped(batchSize).flatMap(batch => scoreBatch(m, batch))
      }
    out.toDF(idCol, "margin", "sentiment")
  }
}
