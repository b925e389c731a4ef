package graft

import graft.operators.JsonOps

class JsonOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("typed extraction: malformed / missing / null degrade to NULL, never fail") {
    val events = Seq(
      ("click", """{"k": 10}"""), ("click", """{"k": 4}"""),
      ("click", """{"other": 1}"""),      // field missing -> NULL
      ("view", """not json at all"""),    // malformed -> NULL
      ("view", null.asInstanceOf[String]),// null payload -> NULL
      ("view", """{"k": 7}"""))
      .toDF("event_type", "props")
    val out = JsonOps.propsSummary(events)
      .as[(String, Long, Long, Long, Double, Int, Int)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("click", 3L, 2L, 14L, 7.0, 4, 10),
      ("view", 3L, 1L, 7L, 7.0, 7, 7)))
  }

  test("one parse per row: a single from_json feeds every extracted field") {
    val events = Seq(("click", """{"k": 1}""")).toDF("event_type", "props")
    val plan = JsonOps.propsSummary(events).queryExecution.executedPlan.toString
    assert(plan.split("from_json").length - 1 <= 1,
      s"expected at most one from_json in the plan:\n$plan")
  }
}
