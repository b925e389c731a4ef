package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Core relational operators (SURVEY §2 q01–q17), generalizing the
  * reference's ETL semantics (`/root/reference/airflow/dags/tasks/tweets.py`,
  * `market.py`) into reusable DataFrame→DataFrame transforms.
  *
  * Numeric discipline: money-ish doubles are summed as DECIMAL so the
  * result is independent of partial-aggregation order (a double sum over N
  * partitions is order-dependent; a decimal sum is exact), then cast back
  * to double for a stable, engine-neutral output. See SURVEY §5.
  */
object Relational {

  /** Cast a 2-dp money double to an exact decimal for order-independent
    * sums. Precision 12 keeps products within decimal range:
    * (12,2)×(5,2)×(5,2) → (24,6), far below the 38-digit ceiling.
    */
  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def decSum(c: Column): Column = sum(dec(c)).cast("double")

  /** q01: projection + equality filter + negated prefix filter — the
    * reference's tweet-ingest shape (`tweets.py:50-51`: `select('full_text')`,
    * `lang == 'en'`, `~startswith('RT @')`).
    */
  def filterProject(docs: DataFrame): DataFrame =
    docs
      .filter(col("lang") === "en" && !col("text").startsWith("the "))
      .select(col("doc_id"), col("text"), col("n_chars"))

  /** q02: per-document sentiment — lexicon counts + majority vote
    * (`tweets.py:53-59` re-expressed as codegen'd columns, no UDF).
    */
  def sentiment(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      TextFunctions.positiveCount(col("text")).cast("long").as("n_pos"),
      TextFunctions.negativeCount(col("text")).cast("long").as("n_neg"),
      TextFunctions.overallSentiment(col("text")).as("sentiment"))

  /** q03: sentiment counts pivoted to a wide per-group record
    * (`tweets.py:62-77`'s groupBy-count + wide summary row).
    */
  def sentimentSummary(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), TextFunctions.overallSentiment(col("text")).as("sentiment"))
      .groupBy("source")
      .pivot("sentiment", Seq("positive", "negative", "na"))
      .count()
      .select(
        col("source"),
        coalesce(col("positive"), lit(0L)).as("positive_count"),
        coalesce(col("negative"), lit(0L)).as("negative_count"),
        coalesce(col("na"), lit(0L)).as("na_count"))

  /** q04: multi-aggregate pricing summary (TPC-H Q1 shape). */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val disc = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    val charge = disc * (lit(1) + dec(col("l_tax")))
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
        round(sum(dec(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q05: star join — fact lineitem against broadcast dims
    * supplier→nation→region, revenue by nation. Only the fact table
    * shuffles (for the final agg); every dim join is a BroadcastHashJoin.
    */
  def starRevenue(
      lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val revenue = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(revenue).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q06: date-part derivation + composite date id + daily aggregate
    * (`tweets.py:41-43,67-70`, `market.py:31-41`).
    */
  def datePartsDaily(orders: DataFrame): DataFrame =
    orders
      .select(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        col("o_totalprice"))
      .withColumn("date_id", (col("y") * 10000 + col("m") * 100 + col("d")).cast("int"))
      .groupBy("date_id", "y", "m", "d")
      .agg(
        count(lit(1)).as("n_orders"),
        round(decSum(col("o_totalprice")), 2).as("total_price"))

  /** q07: data-quality suite as ONE Spark job (`tweets.py:136-142`,
    * `market.py:45-52` ran one driver round-trip per check): row count,
    * null rate, pk uniqueness, domain checks — a single scan + stack.
    */
  def qualityChecks(orders: DataFrame): DataFrame =
    orders
      .agg(
        count(lit(1)).as("row_count"),
        (count(lit(1)) - count(col("o_custkey"))).as("null_custkey"),
        (count(lit(1)) - count_distinct(col("o_orderkey"))).as("pk_dup"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpositive_total"),
        sum(when(col("o_orderdate") > lit("2001-08-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("future_orders"))
      .selectExpr(
        """stack(5,
          |  'row_count', row_count,
          |  'null_custkey', null_custkey,
          |  'pk_dup', pk_dup,
          |  'nonpositive_total', nonpositive_total,
          |  'future_orders', future_orders) as (check_name, value)""".stripMargin)

  /** q08: two daily aggregates joined on date — the reference's
    * markets_value ⋈ tweets_sentiment analysis join (README.md).
    */
  def dailyJoin(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        count(lit(1)).as("n_purchases"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("purchase_value"))
    val clicks = events
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n_clicks"))
    purchases.join(clicks, Seq("d"))
  }

  /** q09: window functions — running sum / rank / lag per user. The
    * running sum accumulates DECIMAL inside the frame so both engines (and
    * any partitioning) agree bit-for-bit.
    */
  def windowFuncs(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col("event_id"),
      col("user_id"),
      row_number().over(w).cast("int").as("rnk"),
      sum(col("value").cast("decimal(18,2)")).over(wRows).cast("double").as("running_value"),
      lag(col("value"), 1).over(w).as("prev_value"))
  }

  /** q10: top-k per group via window + filter. */
  def topKPerGroup(orders: DataFrame, k: Int = 3): DataFrame = {
    // bounded top-k aggregation, not a window: at most k rows leave each
    // input partition per priority and nothing gets sorted (the window
    // twin shuffles + sorts the whole table). Ranks come back from the
    // buffer's insertion order via posexplode.
    val topk = udaf(
      new BoundedTopK[(Double, Long)](k)((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)),
      org.apache.spark.sql.Encoders.product[(Double, Long)])
    orders
      .groupBy(col("o_orderpriority"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("w"))
      .select(col("o_orderpriority"), posexplode(col("w")).as(Seq("pos", "x")))
      .select(
        col("o_orderpriority"),
        col("x._2").as("o_orderkey"),
        col("x._1").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** q11: pivot — event_type × day count matrix (`tweets.py:64-77`'s wide
    * record, generalized to a dynamic pivot with a pinned column list so
    * the output schema is stable).
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  def pivotDaily(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d")
      .pivot("event_type", EventTypes)
      .count()
      .select(
        col("d") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  /** q12: gap-based sessionization — lag + cumulative flag sum. Timestamps
    * are compared as epoch micros so the whole computation is integer
    * arithmetic (engine- and timezone-neutral).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn(
        "new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(wRows))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
  }

  /** q45: gap sessionization via Spark's NATIVE `session_window` — the
    * second formulation of q12, and the one whose exact expression also
    * runs under Structured Streaming (state-store-backed session merge).
    *
    * Split semantics match q12's lag formulation (spec-pinned): sessions
    * merge when the next event is within OR AT exactly prev + gap, i.e.
    * split on diff > gap. The only output difference is the window end:
    * last-event + gap (the session's expiry), not the last event itself.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))

  /** q13: tumbling time-window aggregation (batch twin of
    * [[graft.streaming.EventStream]]). Uses Spark's `window()` so the
    * exact same expression runs under Structured Streaming.
    */
  def tumblingWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("total_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("total_value"))

  /** q14: hierarchical rollup over region → nation with broadcast dims. */
  def rollupAcctbal(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(decSum(col("c_acctbal")), 2).as("total_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"), col("total_acctbal"))

  /** q15: left-semi + left-anti join — customers with / without orders,
    * tagged and unioned. Both halves shuffle only the keys.
    */
  def semiAntiJoin(customer: DataFrame, orders: DataFrame): DataFrame = {
    val keys = orders.select(col("o_custkey"))
    val withOrders = customer
      .join(keys, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("with_orders").as("kind"), col("c_custkey"), col("c_name"))
    val noOrders = customer
      .join(keys, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("no_orders").as("kind"), col("c_custkey"), col("c_name"))
    withOrders.unionAll(noOrders)
  }

  /** q18: multi-dimensional cube aggregate with grouping_id — the
    * generalization of q14's rollup to every (priority × year) subtotal
    * combination in ONE pass. Catalyst expands each input row ×4 before
    * the partial aggregate, so the shuffle still carries only
    * (group, partial agg) rows — no per-grouping-set rescan, which is the
    * property that matters at 100 TB (a UNION ALL of 4 separate GROUP BYs
    * reads the fact table 4 times).
    *
    * `grouping_id()`'s bit order (first cube column = most significant
    * bit) matches ANSI `GROUPING(a, b)`, so the oracle compares it
    * directly.
    */
  def cubeOrders(orders: DataFrame): DataFrame =
    orders
      .select(
        col("o_orderpriority"),
        year(col("o_orderdate")).cast("int").as("y"),
        col("o_totalprice"))
      .cube(col("o_orderpriority"), col("y"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"),
        round(decSum(col("o_totalprice")), 2).as("total_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        coalesce(col("y"), lit(-1)).as("y"),
        col("gid"), col("n_orders"), col("total_price"))

  /** q19: set operators with ANSI bag/set semantics — INTERSECT,
    * EXCEPT (both directions) over the customer sets of two order eras,
    * tagged and unioned into one result. Spark plans these as left-semi /
    * left-anti joins over distinct keys: only the (custkey) column ever
    * shuffles, never order payloads. Each era's key set feeds three
    * branches, so it is materialized once (key column only) — without
    * that the three set operations scan the orders source six times.
    */
  def setOps(orders: DataFrame, splitYear: Int = 1998): DataFrame = {
    val early = orders
      .filter(year(col("o_orderdate")) < splitYear).select(col("o_custkey"))
      .localCheckpoint()
    val late = orders
      .filter(year(col("o_orderdate")) >= splitYear).select(col("o_custkey"))
      .localCheckpoint()
    early.intersect(late).select(lit("both_eras").as("kind"), col("o_custkey"))
      .unionAll(early.except(late).select(lit("early_only").as("kind"), col("o_custkey")))
      .unionAll(late.except(early).select(lit("late_only").as("kind"), col("o_custkey")))
  }

  /** q16: exact distinct aggregates. */
  def distinctAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_supps"),
        count_distinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))

  /** q36: top-k word bigrams per source by document frequency — the
    * corpus-statistics op a training-data pipeline runs to spot
    * boilerplate. Shingles are distinct per document, so the count is a
    * true document frequency; partial aggregation combines map-side
    * before the (source, ngram) shuffle; the per-source top-k is a
    * window-filter over the (small) aggregated set.
    */
  def ngramTopK(docs: DataFrame, k: Int = 5): DataFrame = {
    // df per (source, ngram) partial-aggregates map-side as usual; the
    // per-source top-k is then a bounded aggregator — no per-source sort,
    // at most k ngrams per source per partition on the second shuffle
    val topk = udaf(
      new BoundedTopK[(Long, String)](k)((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)),
      org.apache.spark.sql.Encoders.product[(Long, String)])
    docs
      .select(col("source"),
        explode(TextFunctions.shingles(col("text"), 2)).as("ngram"))
      .groupBy("source", "ngram")
      .agg(count(lit(1)).as("df"))
      .groupBy(col("source"))
      .agg(topk(col("df"), col("ngram")).as("w"))
      .select(col("source"), posexplode(col("w")).as(Seq("pos", "x")))
      .select(
        col("source"),
        col("x._2").as("ngram"),
        col("x._1").as("df"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** Per-document Shannon entropy of the character and token
    * distributions (bits) — the repetition/garbage signal Gopher-class
    * quality filters cut on: natural text sits in a band, keyboard-mash
    * and boilerplate fall outside it.
    *
    * Shape: explode → (doc, unit) counts → one aggregation per doc using
    * H = (ln n − Σ c·ln c / n) / ln 2, so the per-doc pass never builds a
    * distribution map in memory and the shuffle carries count partials
    * only (the q38 explode-first discipline). Rounded 4 dp (`ln` agrees
    * cross-engine at this precision, proven by q42). ASCII corpus note:
    * Spark splits UTF-16 code units, DuckDB characters — identical on
    * ASCII, bucket first for emoji-laden text.
    */
  def entropySignals(docs: DataFrame): DataFrame = {
    def entropyOf(unit: Column): DataFrame = docs
      .select(col("doc_id"), explode(unit).as("u"))
      .groupBy(col("doc_id"), col("u")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round(
        (log(sum(col("c")).cast("double"))
          - sum(col("c").cast("double") * log(col("c").cast("double")))
          / sum(col("c")).cast("double")) / lit(math.log(2.0)), 4).as("h"))
    entropyOf(split(col("text"), ""))
      .withColumnRenamed("h", "char_entropy")
      .join(entropyOf(split(col("text"), " "))
        .withColumnRenamed("h", "token_entropy"), Seq("doc_id"))
  }

  /** q42: top-k TF-IDF terms per document — the keyword-extraction pass of
    * a corpus pipeline. Smoothed idf: ln((N+1)/(df+1)) + 1.
    *
    * Three aggregations, all linear: (doc, term) term frequencies; df per
    * term over those (already-distinct) rows; then per-doc top-k through
    * the bounded aggregator — at most k terms leave each partition per
    * doc, nothing sorts a whole vocabulary. N arrives as a broadcast
    * one-row cross join, not a collected scalar.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    val topk = udaf(
      new BoundedTopK[(Double, String)](k)((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)),
      org.apache.spark.sql.Encoders.product[(Double, String)])
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("term"),
        round(
          col("tf") * (log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1)))
            + lit(1)), 6).as("tfidf"))
      .groupBy(col("doc_id"))
      .agg(topk(col("tfidf"), col("term")).as("w"))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "x")))
      .select(
        col("doc_id"),
        col("x._2").as("term"),
        col("x._1").as("tfidf"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** q17: HLL++ approximate distinct — the scale path of q16 (one pass, no
    * per-key shuffle of distinct values; the sketch estimate is
    * engine-specific, so the driver gate is [[approxDistinctGate]]).
    */
  def approxDistinct(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        count(lit(1)).as("n_rows"))

  /** q37: per-source corpus quality profile — exact percentiles of the
    * document-length distribution (the stats a training-data pipeline
    * tracks to spot source drift), PLUS the sketch twin gated in-query:
    * `approx_percentile` (the one-pass mergeable scale path — exact
    * `percentile` buffers each group's values) must land inside the
    * exact [p−0.08, min(p+0.08, 1)] quantile window. The window is
    * quantile-based because the sketch's error contract is on RANK, not
    * value, and the sketch returns an element where exact interpolates —
    * ±0.08 is ≥ 2 ranks at the driver's smallest per-source group (25
    * docs), covering both effects, while a sketch off by more than 8
    * percentile ranks fails. Gate needs ≥ ~15 rows per group to be
    * meaningful (below that the window rounds to < 1 element).
    */
  def qualityPercentilesGate(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
        round(expr("percentile(n_chars, 0.9)"), 4).as("p90_chars"),
        round(expr("percentile(n_chars, 0.99)"), 4).as("p99_chars"),
        expr("percentile(n_chars, array(0.42, 0.58, 0.82, 0.98, 0.91, 1.0))").as("bounds"),
        expr("approx_percentile(n_chars, array(0.5, 0.9, 0.99), 1000)").as("sk"))
      .select(
        col("source"), col("n_docs"),
        col("p50_chars"), col("p90_chars"), col("p99_chars"),
        col("sk").getItem(0).between(col("bounds").getItem(0), col("bounds").getItem(1))
          .as("sk50_ok"),
        col("sk").getItem(1).between(col("bounds").getItem(2), col("bounds").getItem(3))
          .as("sk90_ok"),
        col("sk").getItem(2).between(col("bounds").getItem(4), col("bounds").getItem(5))
          .as("sk99_ok"))

  /** Driver-checkable gate for [[approxDistinct]]: the HLL++ estimate is
    * engine-specific, but |estimate − exact| / exact ≤ `relErr` is not —
    * an exact-SQL oracle recomputes the exact counts and asserts the
    * booleans TRUE. rsd = 0.02 makes a 5% bound ~2.5 standard errors:
    * deterministic data + deterministic sketch → a stable pass, while a
    * broken sketch (or a wrong column) fails it. The exact count_distinct
    * here is the gate's reference, not the operator — the operator's
    * whole point at 100 TB is NOT computing it.
    */
  def approxDistinctGate(lineitem: DataFrame, relErr: Double = 0.05): DataFrame = {
    // The sketch and the exact reference aggregate SEPARATELY and join on
    // the (tiny) group key: mixing multi-column count_distinct (Expand ×2)
    // with an HLL ImperativeAggregate in ONE aggregation forces every
    // expanded row through a sort-based fallback — measured 24 s where the
    // two-job formulation runs in ~2.5 s at sf0.1.
    val exact = lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count_distinct(col("l_partkey")).as("exact_parts"),
        count_distinct(col("l_orderkey")).as("exact_orders"),
        count(lit(1)).as("n_rows"))
    val approx = lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
    exact.join(approx, Seq("l_returnflag"))
      .select(
        col("l_returnflag"), col("exact_parts"), col("exact_orders"), col("n_rows"),
        (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * relErr).as("parts_ok"),
        (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * relErr).as("orders_ok"))
  }
}
