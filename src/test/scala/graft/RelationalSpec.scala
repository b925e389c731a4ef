package graft

import java.sql.Timestamp

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("star join plan broadcasts every dim (BroadcastHashJoin x3, no SortMergeJoin)") {
    val li = Seq((1L, 10L, 100.0, 0.1)).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Seq((10L, 20)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((20, 30, "GERMANY")).toDF("n_nationkey", "n_regionkey", "n_name")
    val reg = Seq((30, "EUROPE")).toDF("r_regionkey", "r_name")
    val plan = Relational.starRevenue(li, sup, nat, reg)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("pricing summary on a hand-computed slice") {
    val ts = Timestamp.valueOf("1998-01-01 00:00:00")
    val li = Seq(
      ("A", "F", 10.0, 100.0, 0.10, 0.05, ts),
      ("A", "F", 20.0, 200.0, 0.00, 0.10, ts),
      ("R", "O", 5.0, 50.0, 0.50, 0.00, Timestamp.valueOf("1999-01-01 00:00:00")))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate")
    val rows = Relational.pricingSummary(li).collect()
    assert(rows.length == 1) // the 1999 row is filtered out
    val r = rows(0)
    assert(r.getAs[Double]("sum_qty") == 30.0)
    assert(r.getAs[Double]("sum_base_price") == 300.0)
    assert(math.abs(r.getAs[Double]("sum_disc_price") - (90.0 + 200.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("sum_charge") - (90.0 * 1.05 + 200.0 * 1.10)) < 1e-9)
    assert(r.getAs[Long]("count_order") == 2L)
  }

  test("sessionize splits on gaps > 30 min and counts events per session") {
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val ev = Seq(
      (1L, 1L, t(0)), (1L, 2L, t(10)), (1L, 3L, t(20)),   // session 1: 3 events
      (1L, 4L, t(120)), (1L, 5L, t(125)),                 // session 2: 2 events
      (2L, 6L, t(0))                                      // other user: own session
    ).toDF("user_id", "event_id", "ts")
    val out = Relational.sessionize(ev)
      .select($"user_id", $"n_events").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 2L), (1L, 3L), (2L, 1L)))
  }

  test("date parts + composite id") {
    val orders = Seq(
      (Timestamp.valueOf("1997-03-05 00:00:00"), 10.0),
      (Timestamp.valueOf("1997-03-05 12:00:00"), 20.0),
      (Timestamp.valueOf("1998-12-31 00:00:00"), 5.0))
      .toDF("o_orderdate", "o_totalprice")
    val out = Relational.datePartsDaily(orders)
      .select($"date_id", $"n_orders", $"total_price")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((19970305, 2L, 30.0), (19981231, 1L, 5.0)))
  }

  test("pivot fills absent event types with zero") {
    val ev = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click"),
      (Timestamp.valueOf("2024-01-01 11:00:00"), "click"),
      (Timestamp.valueOf("2024-01-02 10:00:00"), "view"))
      .toDF("ts", "event_type")
    val out = Relational.pivotDaily(ev)
      .selectExpr("cast(d as string)", "n_click", "n_view", "n_error")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("2024-01-01", 2L, 0L, 0L), ("2024-01-02", 0L, 1L, 0L)))
  }

  test("rollup emits leaf, subtotal and grand-total rows") {
    val cust = Seq((1L, 10), (2L, 10), (3L, 20)).toDF("c_custkey", "c_nationkey")
      .withColumn("c_acctbal", $"c_custkey".cast("double"))
    val nat = Seq((10, 100, "DE"), (20, 100, "FR")).toDF("n_nationkey", "n_regionkey", "n_name")
    val reg = Seq((100, "EUROPE")).toDF("r_regionkey", "r_name")
    val out = Relational.rollupAcctbal(cust, nat, reg)
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(
      ("EUROPE", "DE", 2L, 3.0), ("EUROPE", "FR", 1L, 3.0),
      ("EUROPE", "ALL", 3L, 6.0), ("ALL", "ALL", 3L, 6.0)))
  }

  test("as-of join picks the latest prior-or-equal right row per key") {
    val l = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L), (2L, 10L, 103L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 900L), (1L, 10L, 901L), (1L, 15L, 902L), (3L, 1L, 903L))
      .toDF("k", "t", "rid")
    val out = graft.operators.AsofJoin.joinPriorEqual(l, r, "k", "t", "rid")
      .select($"lid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      100L -> Some(901L), // t=10: inclusive match, dup right resolved to max
      101L -> Some(902L), // t=20: latest prior is t=15
      102L -> None,       // t=5: nothing at or before
      103L -> None))      // key 2: no right rows
  }

  test("bin range join equals the naive inequality join") {
    val pts = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    val rng = Seq((1L, 5.0, 30.0), (2L, 25.0, 26.0), (3L, 120.0, 200.0), (4L, -10.0, 0.5))
      .toDF("rid", "lo", "hi")
    val naive = pts.join(rng, $"v" >= $"lo" && $"v" < $"hi")
      .select($"pid", $"rid").as[(Long, Long)].collect().toSet
    val binned = graft.operators.RangeJoin.binJoin(pts, rng, "v", "lo", "hi", binWidth = 10.0)
      .select($"pid", $"rid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }

  test("overlap join equals the naive join, once per pair, half-open edges") {
    val rnd = new scala.util.Random(11)
    val a = (1 to 120).map { i =>
      val lo = rnd.nextDouble() * 100; (i.toLong, lo, lo + rnd.nextDouble() * 15)
    }.toDF("a_id", "a_lo", "a_hi")
    val b = (1 to 150).map { i =>
      val lo = rnd.nextDouble() * 100; (i.toLong, lo, lo + rnd.nextDouble() * 8)
    }.toDF("b_id", "b_lo", "b_hi")
    val naive = a.join(b, $"a_lo" < $"b_hi" && $"b_lo" < $"a_hi")
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    val binned = graft.operators.RangeJoin
      .overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 7.0)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(binned.length == binned.toSet.size, "pair emitted more than once")
    assert(binned.toSet == naive.toSet && naive.nonEmpty)

    // half-open: touching intervals [0,5) and [5,8) do NOT overlap;
    // nested and identical intervals do
    val ha = Seq((1L, 0.0, 5.0), (2L, 10.0, 20.0)).toDF("a_id", "a_lo", "a_hi")
    val hb = Seq((1L, 5.0, 8.0), (2L, 12.0, 13.0), (3L, 10.0, 20.0))
      .toDF("b_id", "b_lo", "b_hi")
    val h = graft.operators.RangeJoin
      .overlapJoin(ha, hb, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 5.0)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(h == Set((2L, 2L), (2L, 3L)))
  }

  test("weighted sample: deterministic, respects weights, skips w<=0") {
    val docs = (1 to 400).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
        if (i % 97 == 0) 0L else (i % 10) * 100L + 1L))
      .toDF("doc_id", "source", "n_chars")
    val s1 = graft.operators.Sampling
      .weightedN(docs, "source", "doc_id", "n_chars", 5)
      .as[(Long, String, Long)].collect().toSet
    val s2 = graft.operators.Sampling
      .weightedN(docs.repartition(13), "source", "doc_id", "n_chars", 5)
      .as[(Long, String, Long)].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    assert(s1.count(_._2 == "a") == 5 && s1.count(_._2 == "b") == 5)
    assert(s1.forall(_._3 > 0), "zero-weight rows must never be sampled")
    // reference: smallest hash/weight priority per stratum, computed in Scala
    def hash(id: Long) = ((id % 2147483647L) * 1103515245L + 12345L) % 2147483647L
    val expect = (1 to 400)
      .map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
        if (i % 97 == 0) 0L else (i % 10) * 100L + 1L))
      .filter(_._3 > 0)
      .groupBy(_._2).flatMap { case (_, rows) =>
        rows.sortBy(r => (hash(r._1).toDouble / r._3, r._1)).take(5)
      }.toSet
    assert(s1 == expect)
  }

  test("entropy signals: hand-computed char/token entropy in bits") {
    val docs = Seq((1L, "aab b"), (2L, "aaaa")).toDF("doc_id", "text")
    // doc 1 chars {a:2, b:2, ' ':1}, n=5:
    // H = (ln 5 - (2ln2 + 2ln2 + 0)/5)/ln 2 = 1.5219 bits
    val h1 = (math.log(5) - 4 * math.log(2) / 5) / math.log(2)
    val got = graft.operators.Relational.entropySignals(docs)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(got(0)._2 == math.rint(h1 * 10000) / 10000)
    assert(got(0)._3 == 1.0) // two distinct tokens, one each -> exactly 1 bit
    assert(got(1)._2 == 0.0 && got(1)._3 == 0.0) // single symbol -> zero
  }

  test("quality checks flag planted defects") {
    val ts = Timestamp.valueOf("2000-01-01 00:00:00")
    val orders = Seq(
      (1L, Option(5L), 10.0, ts),
      (1L, Option(6L), -2.0, ts),                                 // dup pk + nonpositive
      (3L, Option.empty[Long], 7.0, Timestamp.valueOf("2002-01-01 00:00:00")) // null fk + future
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val checks = Relational.qualityChecks(orders)
      .as[(String, Long)].collect().toMap
    assert(checks == Map(
      "row_count" -> 3L, "null_custkey" -> 1L, "pk_dup" -> 1L,
      "nonpositive_total" -> 1L, "future_orders" -> 1L))
  }

  test("topK per group keeps exactly k, ordered, per partition key") {
    val orders = (1L to 20L).map(i => (i, s"P${i % 2}", i.toDouble)).toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val out = Relational.topKPerGroup(orders, k = 3)
      .select($"o_orderpriority", $"rk", $"o_orderkey").as[(String, Int, Long)].collect().toSet
    assert(out == Set(
      ("P0", 1, 20L), ("P0", 2, 18L), ("P0", 3, 16L),
      ("P1", 1, 19L), ("P1", 2, 17L), ("P1", 3, 15L)))
    // bounded aggregation, not a window: no per-group sort anywhere
    val plan = Relational.topKPerGroup(orders, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"top-k must not window-sort:\n$plan")
    assert(plan.contains("partial_boundedtopk"),
      s"top-k must partial-aggregate map-side:\n$plan")
  }

  test("ngram top-k ranks by doc frequency with ngram tie-break, no window sort") {
    val docs = Seq(
      (1L, "srcA", "x y x y z q"), (2L, "srcA", "x y q r"),
      (3L, "srcB", "a b a b")).toDF("doc_id", "source", "text")
    val out = Relational.ngramTopK(docs, k = 2)
      .select($"source", $"rk", $"ngram", $"df")
      .as[(String, Int, String, Long)].collect().toSet
    // srcA: "x y" df=2; ties at df=1 break alphabetically -> "q r"
    assert(out == Set(
      ("srcA", 1, "x y", 2L), ("srcA", 2, "q r", 1L),
      ("srcB", 1, "a b", 1L), ("srcB", 2, "b a", 1L)))
    val plan = Relational.ngramTopK(docs, k = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && plan.contains("partial_boundedtopk"))
  }

  test("session_window: split at EXACTLY gap, end = last + gap") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val us = (min: Int) => ts(min).getTime * 1000L
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)), // one session
      (1L, ts(40)), // exactly gap (30 min) after t10 -> MERGES (split is diff > gap)
      (1L, ts(71)), // 31 min after t40 -> new session
      (2L, ts(0)))
      .toDF("user_id", "ts")
    val out = Relational.sessionWindowAgg(events)
      .as[(Long, Long, Long, Long)].collect().toSet
    val gapUs = 30L * 60 * 1000000
    assert(out == Set(
      (1L, us(0), us(40) + gapUs, 3L),
      (1L, us(71), us(71) + gapUs, 1L),
      (2L, us(0), us(0) + gapUs, 1L)))
  }

  test("cube emits leaf/subtotal/total rows with the ANSI grouping_id bitmask") {
    val orders = Seq(
      ("HIGH", "1997-03-01", 10.0), ("HIGH", "1998-05-01", 20.0),
      ("LOW", "1997-07-01", 5.0))
      .toDF("o_orderpriority", "d", "o_totalprice")
      .withColumn("o_orderdate", $"d".cast("timestamp"))
    val out = Relational.cubeOrders(orders)
      .select($"pri", $"y", $"gid", $"n_orders", $"total_price")
      .as[(String, Int, Int, Long, Double)].collect().toSet
    assert(out == Set(
      ("HIGH", 1997, 0, 1L, 10.0), ("HIGH", 1998, 0, 1L, 20.0),
      ("LOW", 1997, 0, 1L, 5.0),
      ("HIGH", -1, 1, 2L, 30.0), ("LOW", -1, 1, 1L, 5.0), // year rolled up
      ("ALL", 1997, 2, 2L, 15.0), ("ALL", 1998, 2, 1L, 20.0), // pri rolled up
      ("ALL", -1, 3, 3L, 35.0))) // grand total
  }

  test("tfidf: smoothed idf, rank by rounded score then term, bounded agg") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Relational.tfidfTopK(docs, k = 2)
      .as[(Long, String, Double, Int)].collect().toSet
    val idfRare = math.rint((math.log(3.0 / 2) + 1) * 2 * 1e6) / 1e6 // tf=2, df=1
    val idfRare1 = math.rint((math.log(3.0 / 2) + 1) * 1e6) / 1e6 // tf=1, df=1
    assert(out == Set(
      (1L, "a", idfRare, 1), (1L, "b", 1.0, 2), // b: df=2 -> idf=1
      (2L, "c", idfRare1, 1), (2L, "b", 1.0, 2)))
    val plan = Relational.tfidfTopK(docs, k = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && plan.contains("partial_boundedtopk"))
  }

  test("set ops: intersect/except tags partition the distinct key space") {
    val orders = Seq(
      (1L, "1997-01-01"), (1L, "1998-01-01"), // both eras
      (2L, "1996-06-01"), (2L, "1997-06-01"), // early only (dup within era)
      (3L, "1999-01-01")) // late only
      .toDF("o_custkey", "d")
      .withColumn("o_orderdate", $"d".cast("timestamp"))
    val out = Relational.setOps(orders)
      .as[(String, Long)].collect().toSet
    assert(out == Set(("both_eras", 1L), ("early_only", 2L), ("late_only", 3L)))
    // set semantics: the era-internal duplicate of custkey 2 collapsed
    assert(Relational.setOps(orders).count() == 3)
  }
}
