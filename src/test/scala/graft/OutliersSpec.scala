package graft

import graft.operators.Outliers
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkTestBase {
  import spark.implicits._

  // Deterministic heavy-tailed doubles — the exact shape the r5 VERDICT
  // flagged as the exact-percentile OOM hazard: arbitrary UNROUNDED values,
  // so the exact aggregation buffer is O(group size). 3 groups × 400 rows.
  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 1 to 400
    } yield (s"$g$i", g, math.exp(rnd.nextGaussian() * 2) * 100)
    rows.toDF("id", "grp", "v")
  }

  test("cutGate: approx cuts land inside the exact rank window on unrounded doubles") {
    val gate = Outliers.cutGate(corpus, "grp", "v").collect()
    assert(gate.length == 3)
    gate.foreach { r =>
      assert(r.getAs[Long]("n") == 400L)
      assert(r.getAs[Boolean]("lo_ok") && r.getAs[Boolean]("hi_ok"),
        s"sketch cut escaped the exact ±0.08 quantile window: $r")
    }
  }

  test("winsorize approxCuts: clamp-set shift bounded by the sketch's rank error") {
    val exact = Outliers.winsorize(corpus, "grp", "v")
      .select(col("id"), col("grp"), col("v"), col("v_w").as("w_exact"))
    val approx = Outliers.winsorize(corpus, "grp", "v", approxCuts = true)
      .select(col("id"), col("v_w").as("w_approx"))
    val joined = exact.join(approx, "id").localCheckpoint()
    assert(joined.count() == 1200, "clamping must never drop or duplicate rows")

    // A cut moved by at most `window` quantile ranks can flip clamp status
    // for at most window·n rows per tail: 2 · 0.08 · 400 = 64 per group.
    // (With accuracy=10000 ≫ n the sketch is near-exact and the observed
    // shift is ~0 — the bound is the contract, not the expectation.)
    val flips = joined.filter(
        (col("w_exact") === col("v")) =!= (col("w_approx") === col("v")))
      .groupBy(col("grp")).agg(count(lit(1)).as("n_flip"))
      .as[(String, Long)].collect().toMap
    flips.foreach { case (g, n) =>
      assert(n <= 64, s"group $g: $n clamp-status flips exceeds the 2·window·n bound")
    }

    // Both paths clamp INTO their window: every approx-path output lies
    // within the exact p05−0.08 .. p95+0.08 quantile range of its group.
    val range = corpus.groupBy(col("grp")).agg(
      expr("percentile(v, 0.0)").as("vmin"),
      expr("percentile(v, 0.97)").as("p97plus"))
    val escaped = joined.join(range, "grp")
      .filter(col("w_approx") < col("vmin") - lit(1e-6) ||
        col("w_approx") > col("p97plus") + lit(1e-6))
      .count()
    assert(escaped == 0, s"$escaped approx-clamped values outside the sane range")
  }
}
