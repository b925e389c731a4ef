package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Column profiling — ANALYZE TABLE for any DataFrame: one pass over the
  * data (a single aggregation; Catalyst plans the distinct counts as its
  * usual expand), long-format output (col_name, metric, val) so the
  * result is schema-stable whatever the input schema is. The quality-gate
  * companion to `Relational.qualityChecks`: that one asserts, this one
  * MEASURES (the numbers a pipeline logs per run to spot drifting nulls,
  * exploding cardinalities, shrinking ranges).
  *
  * Cross-engine discipline: every value is a DOUBLE; fractional sums are
  * accumulated as DECIMAL(28,6) before the one IEEE division (the q43
  * pattern), integral/length sums are exact BIGINTs — so the profile is
  * bit-reproducible on any engine and partitioning.
  *
  * Scale note: exact `count_distinct` per column is the fidelity choice
  * here; on 100 TB profile runs swap in `approx_count_distinct` (HLL, one
  * pass, no expand) — same output shape.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val targets = if (cols.isEmpty) df.columns.toSeq else cols
    val aggs = ArrayBuffer.empty[Column]
    val entries = ArrayBuffer.empty[(String, String, String)]
    def add(c: String, metric: String, e: Column): Unit = {
      val alias = s"${c}__$metric"
      aggs += e.as(alias)
      entries += ((c, metric, alias))
    }
    for (c <- targets) {
      val v = col(c)
      add(c, "n_nulls", (count(lit(1)) - count(v)).cast("double"))
      add(c, "n_distinct", count_distinct(v).cast("double"))
      df.schema(c).dataType match {
        case DoubleType | FloatType | _: DecimalType =>
          add(c, "min", min(v).cast("double"))
          add(c, "max", max(v).cast("double"))
          add(c, "mean", round(
            sum(v.cast("decimal(28,6)")).cast("double") / count(v), 6))
        case LongType | IntegerType | ShortType | ByteType =>
          add(c, "min", min(v).cast("double"))
          add(c, "max", max(v).cast("double"))
          add(c, "mean", round(sum(v).cast("double") / count(v), 6))
        case StringType =>
          add(c, "min_len", min(length(v)).cast("double"))
          add(c, "max_len", max(length(v)).cast("double"))
          add(c, "mean_len", round(
            sum(length(v).cast("long")).cast("double") / count(v), 6))
        case TimestampType =>
          add(c, "min_us", min(unix_micros(v)).cast("double"))
          add(c, "max_us", max(unix_micros(v)).cast("double"))
        case TimestampNTZType =>
          // sessions pin UTC (GraftSession), so NTZ -> TZ is the identity
          // on the wall clock — same micros DuckDB's epoch_us() reports
          add(c, "min_us", min(unix_micros(v.cast("timestamp"))).cast("double"))
          add(c, "max_us", max(unix_micros(v.cast("timestamp"))).cast("double"))
        case _ => () // opaque types: null/distinct counts only
      }
    }
    // NOT spread (r20, tried and rejected): the multi-distinct Expand runs
    // in the scan stage, but spreading it measured flat — the Expand's
    // partial aggregation is already cheap relative to the exchange.
    val one = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val stackExpr = s"stack(${entries.size}, " + entries
      .map { case (c, m, a) => s"'$c', '$m', `$a`" }.mkString(", ") +
      ") as (col_name, metric, val)"
    one.select(expr(stackExpr))
  }
}
