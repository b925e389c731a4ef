package graft.sources

import java.sql.{Connection, ResultSet}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** JDBC execution for the [[SqlSink]] statement builders — the load leg the
  * reference actually runs (`tweets.py:94-101` `PostgresHook.run` for DDL,
  * `:123-133` COPY, `market.py:35-42` row inserts), so a user can complete
  * extract → transform → LOAD with this library alone.
  *
  * Division of labor stays warehouse-agnostic:
  *  - [[SqlSink]] BUILDS statements (no connection, no credentials);
  *  - this object RUNS them over connections the caller creates. Driver-side
  *    work ([[run]], [[queryLong]], [[rowCountGate]]) takes a live
  *    `java.sql.Connection`; the distributed load ([[load]]) takes a
  *    connection FACTORY because a `Connection` cannot ride to executors —
  *    each partition opens its own, the standard Spark JDBC write shape.
  *
  * Scale notes (100 TB): warehouse bulk loads should go through the
  * engine's COPY path ([[SqlSink.stageForCopy]] — stage parquet/JSONL, let
  * the warehouse pull); [[load]] is the INSERT fallback for modest result
  * tables (daily summaries, quality reports — the reference's actual use),
  * batched per partition so round-trips are O(rows / batchSize) and
  * parallel across partitions, never a driver-side collect.
  */
object JdbcSink {

  /** Execute statements in order on the caller's connection (DDL, DML,
    * maintenance). Each statement runs in its own `execute()`; a failure
    * surfaces with the offending statement in the message.
    */
  def run(conn: Connection, statements: Seq[String]): Unit =
    statements.foreach { raw =>
      // builders terminate statements like the reference's .sql files;
      // JDBC execute() takes exactly one statement, no terminator
      val sql = raw.trim.stripSuffix(";")
      val st = conn.createStatement()
      try st.execute(sql)
      catch {
        case e: java.sql.SQLException =>
          throw new java.sql.SQLException(s"failed statement:\n$sql", e)
      } finally st.close()
    }

  /** Run a parameterized query and return its first row's first column as
    * Long — the shape of every quality-gate query the reference issues
    * (`SELECT count(*) ... WHERE date = %s`, `tweets.py:136-142`).
    */
  def queryLong(conn: Connection, sql: String, params: Seq[Any] = Nil): Long = {
    val ps = conn.prepareStatement(sql)
    try {
      params.zipWithIndex.foreach { case (p, i) => ps.setObject(i + 1, p) }
      val rs: ResultSet = ps.executeQuery()
      try { require(rs.next(), s"no rows from gate query:\n$sql"); rs.getLong(1) }
      finally rs.close()
    } finally ps.close()
  }

  /** The reference's post-load quality gate: count rows for the execution
    * key and fail loudly when below `minRows` (`tweets.py:136-142` raises
    * on `count == 0`). Returns the observed count on success.
    */
  def rowCountGate(
      conn: Connection, table: String, keyCol: String, keyValue: Any,
      minRows: Long = 1L): Long = {
    val n = queryLong(conn, SqlSink.rowCountCheckSql(table, keyCol), Seq(keyValue))
    if (n < minRows)
      throw new IllegalStateException(
        s"quality gate failed: $table has $n rows for $keyCol = $keyValue (need >= $minRows)")
    n
  }

  /** Distributed batched INSERT of a DataFrame through
    * [[SqlSink.insertSql]]. `connect` runs ON EXECUTORS (one connection per
    * partition) — pass a serializable factory (driver string + properties
    * captured by value), never a live connection. Commits per partition;
    * `batchSize` bounds both memory and round-trips.
    */
  def load(
      df: DataFrame, table: String,
      connect: () => Connection, batchSize: Int = 500): Unit = {
    val schema: StructType = df.schema
    val insert = SqlSink.insertSql(table, schema)
    val width = schema.length
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(insert)
          try {
            var pending = 0
            rows.foreach { row =>
              var i = 0
              while (i < width) { ps.setObject(i + 1, row.get(i)); i += 1 }
              ps.addBatch()
              pending += 1
              if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
            }
            if (pending > 0) ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }
}
