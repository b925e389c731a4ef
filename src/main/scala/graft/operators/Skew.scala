package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Skew-mitigation utilities (SURVEY §5). AQE's skew-join splitter handles
  * moderate skew at runtime, but a pathological hot key (one key holding a
  * double-digit percentage of a 100 TB fact table) still concentrates work;
  * explicit salting redistributes a hot key across the whole cluster
  * deterministically.
  */
object Skew {

  /** Salted inner equi-join of a skewed `fact` against a (replicable)
    * `dim`.
    *
    * fact gains a uniform salt in [0, salts); dim is exploded ×salts with
    * every salt value; the join key becomes (key, salt). Each hot fact key
    * now spreads over `salts` shuffle partitions instead of one. Output =
    * fact's columns ++ dim's columns (salt plumbing dropped) — semantically
    * identical to `fact.join(dim, fact(factKey) === dim(dimKey))`.
    *
    * Cost model: the dim side is replicated ×salts, so this targets
    * small-to-medium dims that are still ABOVE the broadcast threshold —
    * when the dim fits in memory, `broadcast()` (no shuffle at all) wins.
    *
    * The salt is `pmod(xxhash64(<every fact column>), salts)` — a pure
    * function of row CONTENT, so it is stable under stage retries and
    * AQE re-planning (a `monotonically_increasing_id`-based salt changes
    * when a recomputed upstream reorders rows; correctness survives — the
    * dim carries every salt — but work placement silently moves).
    * Fully-duplicate fact rows necessarily share a salt; a hot KEY still
    * spreads because its rows differ in the other columns.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    // MapType is not hashable (xxhash64 rejects it by default); salt from
    // the remaining columns — content-stability only needs SOME columns
    // that distinguish the hot key's rows
    val hashable = fact.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name))
    require(hashable.nonEmpty, "saltedJoin: fact has no hashable (non-map) columns")
    val salted = fact.withColumn(
      "__salt", pmod(xxhash64(hashable: _*), lit(salts)).cast("int"))
    val exploded = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(exploded,
        salted("__salt") === exploded("__salt") && salted(factKey) === exploded(dimKey))
      .drop("__salt")
  }

  /** The diagnostic that DECIDES between plain join / AQE / [[saltedJoin]]:
    * the top-N hottest keys with their share of the table. One aggregation
    * (count per key, bounded top-N) + one total — a key above ~1/partitions
    * share concentrates a whole shuffle partition; double-digit shares are
    * the saltedJoin regime. Returns (key, n, share, rank) ordered by rank.
    */
  def keyProfile(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("n_total"))
    counts
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
      .crossJoin(broadcast(total))
      .select(
        col("key"), col("n"),
        round(col("n") / col("n_total"), 6).as("share"))
      // Constant partition key: input is post-limit(topN), <= topN rows,
      // so the single-partition window is the point, not a hazard — the
      // dummy key just keeps WindowExec from logging a scale warning.
      // (`pmod(n, 1)`, not `lit(0)` or `n * 0`: a foldable key is pruned
      // by the optimizer, and `n * 0` constant-folds to 0 because count's
      // output is non-nullable — either way the spec goes back to empty.)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("n"), lit(1L)))
          .orderBy(col("n").desc, col("key"))).cast("int"))
  }
}
