package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured JSON column processing (SURVEY §2 q96) — the events
  * table's `props` column is a JSON string, the shape every clickstream /
  * telemetry feed actually arrives in. The Spark-first path is
  * `from_json` with an EXPLICIT schema: one codegen'd parse per row into
  * a typed struct (then ordinary typed column math), no schema-inference
  * scan, no per-field `get_json_object` re-parsing (n fields = n parses),
  * and malformed rows degrade to NULL fields instead of failing the job —
  * all of which is what you want at 100 TB where the parse IS the
  * workload. Aggregation after extraction is an ordinary map-side-combined
  * group-by; sums of the extracted int accumulate as LONG (exact), the
  * mean is one rounded division at the end.
  *
  * Returns per event_type: n_events, n_with_k (parse failures / missing
  * field surface here, not as errors), sum_k, avg_k (4 dp), min_k, max_k.
  */
object JsonOps {

  def propsSummary(events: DataFrame, jsonCol: String = "props"): DataFrame = {
    val k = from_json(
      col(jsonCol),
      org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")
    events
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).cast("long").as("sum_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
  }
}
