package graft

import graft.operators.SketchRollup
import org.apache.spark.sql.functions._

class SketchRollupSpec extends SparkTestBase {
  import spark.implicits._

  // 3 groups × 10 days, overlapping user sets across days
  private def ev = (0 until 3000).map { i =>
    val g = s"g${i % 3}"
    val day = (i / 300).toLong
    val user = (i * 7919L) % 500 // users recur across days
    (g, day, user)
  }.toDF("grp", "day", "user_id")

  test("per-day rollup estimate tracks the direct estimate and the truth") {
    val table = SketchRollup.sketches(ev, "grp", col("day"), "user_id")
    assert(table.count() == 30)
    val merged = SketchRollup.rollup(table, "grp")
      .withColumnRenamed("est_distinct", "m")
    val direct = ev.groupBy($"grp")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("d"),
        count_distinct($"user_id").as("n"))
    val both = merged.join(direct, "grp").as[(String, Long, Long, Long)].collect()
    assert(both.length == 3)
    // union promotes SET-mode sketches to dense HLL, so merged may differ
    // from the (exact at this cardinality) direct answer — but both must
    // sit within sketch accuracy of the truth
    both.foreach { case (g, m, d, n) =>
      assert(math.abs(m - n) <= 0.05 * n, s"group $g: merged $m vs exact $n")
      assert(math.abs(d - n) <= 0.05 * n, s"group $g: direct $d vs exact $n")
    }
  }

  test("range rollup: filtering the sketch table answers a sub-range") {
    val table = SketchRollup.sketches(ev, "grp", col("day"), "user_id")
      .filter($"day" < 3)
    val est = SketchRollup.rollup(table, "grp")
      .as[(String, Long)].collect().toMap
    val exact = ev.filter($"day" < 3).groupBy($"grp")
      .agg(count_distinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= 0.05 * n, s"$g: est ${est(g)} vs exact $n")
    }
  }

  test("rollupGate: exact spine plus both bounds hold") {
    val out = SketchRollup.rollupGate(ev, "grp", col("day"), "user_id")
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(out.length == 3)
    out.foreach { case (g, n, estOk, mergeOk) =>
      assert(n > 0 && estOk && mergeOk, s"$g: n=$n est_ok=$estOk merge_ok=$mergeOk")
    }
  }

  test("sketch binaries are small enough to persist casually") {
    val sizes = SketchRollup.sketches(ev, "grp", col("day"), "user_id")
      .select(length($"sketch")).as[Int].collect()
    assert(sizes.forall(_ < 64 * 1024), s"max sketch ${sizes.max} bytes")
  }
}
