package graft

import java.sql.DriverManager

import graft.pipelines.MarketPipeline
import graft.sources.{JdbcSink, SqlSink}

/** The reference's market branch end to end: CSV feed → markets_value
  * rows → Derby DDL + distributed INSERT + the per-(date, index) quality
  * gate (`market.py` whole flow).
  */
class MarketPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("market day: feed -> composite-id rows -> JDBC load -> per-index gate") {
    // the day's feed, as the reference's scraper would have produced it —
    // one index returned nothing (null value, still a row like the
    // reference's None insert)
    val feed = Seq(
      ("NASDAQOMX/XQC", Some(1234.56)),
      ("NASDAQOMX/NQGI", None)).toDF("index", "value")

    val run = MarketPipeline.processDay(feed, 2020, 1, 21)

    val rows = run.rows.orderBy("index").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("markets_value_id") == "2020-01-21(NASDAQOMX/NQGI)")
    assert(rows(0).isNullAt(rows(0).fieldIndex("value")))
    assert(rows(1).getAs[String]("markets_value_id") == "2020-01-21(NASDAQOMX/XQC)")
    assert(math.abs(rows(1).getAs[Float]("value") - 1234.56f) < 1e-3)
    // names + types match the warehouse schema (Spark's inferred
    // nullability differs; the DDL carries the NOT NULL contract)
    assert(run.rows.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      MarketPipeline.MarketSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(run.insertSql.startsWith("INSERT INTO markets_value"))

    val conn = DriverManager.getConnection("jdbc:derby:memory:graft_market;create=true")
    try {
      JdbcSink.run(conn, Seq(SqlSink.createTableSql(
        "markets_value", MarketPipeline.MarketSchema,
        primaryKey = Some("markets_value_id"),
        ifNotExists = false, varcharWidth = 256)))
      JdbcSink.load(run.rows, "markets_value",
        () => DriverManager.getConnection("jdbc:derby:memory:graft_market"))

      // the reference's gate: rows must exist per (date, index)
      val key = java.sql.Timestamp.valueOf("2020-01-21 00:00:00")
      for (idx <- Seq("NASDAQOMX/XQC", "NASDAQOMX/NQGI"))
        assert(JdbcSink.queryLong(conn, run.qualityCheckSql, Seq(key, idx)) == 1L)
      // and an index that never loaded is caught
      assert(JdbcSink.queryLong(conn, run.qualityCheckSql, Seq(key, "MISSING")) == 0L)

      // the null value survived as SQL NULL, like the reference's None
      val st = conn.createStatement()
      val rs = st.executeQuery(
        """SELECT "value" FROM markets_value WHERE "index" = 'NASDAQOMX/NQGI'""")
      assert(rs.next()); rs.getFloat(1); assert(rs.wasNull())
      rs.close(); st.close()
    } finally conn.close()
  }
}
