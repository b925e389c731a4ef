package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class BandingCalibrationSpec extends SparkTestBase {
  import spark.implicits._

  // Sliding windows over one long word sequence: docs i and i+d share
  // (L−2−d) of their (L−2) trigram shingles, so pair jaccard sweeps
  // smoothly from ~1 (d=1) to 0 as d grows — populating the mid deciles
  // the bimodal driver corpus never exercises.
  private def graded(nDocs: Int, winLen: Int) = {
    val words = (0 until nDocs + winLen).map(i => s"w$i")
    (0 until nDocs).map(i => (i.toLong, words.slice(i, i + winLen).mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("measured S-curve tracks the analytic banding curve across ALL populated deciles") {
    val out = Dedup.bandingCalibration(
      graded(150, 40), "doc_id", "text", maxId = 150, detail = true)
      .as[(Int, Long, Double, Double, Boolean)].collect().sortBy(_._1)
    // the graded corpus populates every decile, incl. the steep middle
    assert(out.length == 10, s"deciles: ${out.map(_._1).toSeq}")
    out.foreach { case (d, n, analytic, measured, ok) =>
      assert(ok, s"decile $d: measured $measured vs analytic $analytic over $n pairs")
    }
    // the ends behave: bottom decile near 0, top decile == 1
    assert(out.head._4 < 0.05 && out.last._4 == 1.0)
    // monotone S-curve in the measurement, not just the formula
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4 - 0.05, s"measured rate dropped ${a._1}->${b._1}: ${a._4} -> ${b._4}")
    }
  }

  test("a deliberately broken banding fails the gate") {
    // rowsPerBand = 1 makes every single minhash row a band key: ANY
    // shared shingle likely collides somewhere, so low-jaccard pairs are
    // caught far above the (32, 4) analytic curve the caller THINKS it
    // is running — the drift the gate exists to catch. Recompute the
    // analytic side at (32, 4) by running the real (32, 1) pipeline and
    // comparing: measured(32,1) must violate analytic(32,4) tolerance in
    // the low-mid deciles.
    val docs = graded(150, 40)
    val right = Dedup.bandingCalibration(
      docs, "doc_id", "text", bands = 32, rowsPerBand = 4, maxId = 150,
      detail = true)
      .as[(Int, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    val wrong = Dedup.bandingCalibration(
      docs, "doc_id", "text", bands = 32, rowsPerBand = 1, maxId = 150,
      detail = true)
      .as[(Int, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    // same corpus, same deciles: the 1-row banding catches mid-jaccard
    // pairs the 4-row scheme (correctly) lets through
    val drift = (2 to 5).map(d => wrong.getOrElse(d, 0.0) - right.getOrElse(d, 0.0))
    assert(drift.exists(_ > 0.3), s"expected low-decile catch inflation, got $drift")
  }

  test("registered shape on the driver corpus: bounded subsample, oracle columns only") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.bandingCalibration(docs, "doc_id", "text")
    assert(out.columns.toSeq == Seq("decile", "n_pairs", "analytic_rate", "gate_ok"))
    val rows = out.as[(Int, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._4), s"gate violations: ${rows.filterNot(_._4).toSeq}")
  }
}
