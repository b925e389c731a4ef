package graft.streaming

import graft.operators.QualityClassifier
import org.apache.spark.sql.DataFrame

/** Streaming QUALITY GATE against a trained perceptron model — the
  * serving half of [[graft.operators.QualityClassifier]] (SURVEY §2):
  * weights are trained offline on a labeled slice
  * ([[QualityClassifier.train]]) and every incoming document is scored
  * as it arrives — how a corpus pipeline filters the live crawl feed
  * with the model the nightly batch fitted, instead of queueing docs for
  * the next batch run.
  *
  * Scoring is a pure per-row expression (the weights ride the plan as
  * literals; Σ_b w_b·cnt_b collapses to a fold over bucket OCCURRENCES,
  * so not even the featurize aggregation is needed — see
  * [[QualityClassifier.scoreText]]): NO shuffle, NO streaming state, the
  * query runs in append mode with zero state stores (spec-asserted via
  * `stateOperators.isEmpty`) and scales with scan bandwidth alone.
  * Batch/stream parity is exact by construction — the same column
  * expressions run in both — and the spec asserts it row for row against
  * [[QualityClassifier.scoreWith]] on the featurized frame, which also
  * pins the occurrence-fold = count-weighted-sum identity.
  */
object StreamQualityGate {

  /** (doc_id, score, pred) for each streamed document; semantics exactly
    * [[QualityClassifier.gate]].
    */
  def scores(
      stream: DataFrame, w: Array[Long],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    QualityClassifier.gate(stream, w, idCol, textCol)
}
