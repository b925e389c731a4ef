package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Relational-sink SQL builders (SURVEY §2 `sources.SqlSink`), mirroring
  * the reference's warehouse DDL/load surface:
  *  - `sql/create_tables.sql` / `drop_tables.sql` → [[createTableSql]] /
  *    [[dropTableSql]] (from a Spark schema, not hand-written DDL);
  *  - `sql/insert_*.sql` (parameterized INSERT) → [[insertSql]];
  *  - the Redshift `COPY ... FORMAT AS JSON/PARQUET` load in
  *    `tweets.py:123-133` → [[copySql]];
  *  - the row-count quality gate `tweets.py:136-142` → [[rowCountCheckSql]].
  *
  * These are pure string builders: the engine stays warehouse-agnostic and
  * testable without a JDBC endpoint, and the caller runs them over
  * whatever connection it owns. Credentials are the CALLER's problem by
  * design — builders never see or embed secrets (the reference inlined AWS
  * keys into the COPY text; at scale that ends up in query logs).
  */
object SqlSink {

  /** Spark type → ANSI-ish warehouse column type. `varcharWidth` is a
    * dialect knob: 65535 is the Redshift max; Derby caps at 32672.
    */
  def sqlType(dt: DataType, varcharWidth: Int = 65535): String = dt match {
    case ByteType | ShortType => "smallint"
    case IntegerType          => "int"
    case LongType             => "bigint"
    case FloatType            => "real"
    case DoubleType           => "double precision"
    case BooleanType          => "boolean"
    case DateType             => "date"
    case _: TimestampType     => "timestamp"
    case d: DecimalType       => s"decimal(${d.precision},${d.scale})"
    case StringType           => s"varchar($varcharWidth)"
    case other =>
      throw new IllegalArgumentException(s"no relational mapping for $other")
  }

  /** CREATE TABLE from a Spark schema; optional primary key (must be one
    * of the schema's fields). `ifNotExists = false` for dialects without
    * the clause (e.g. Derby).
    */
  def createTableSql(
      table: String, schema: StructType, primaryKey: Option[String] = None,
      ifNotExists: Boolean = true, varcharWidth: Int = 65535): String = {
    primaryKey.foreach { pk =>
      require(schema.fieldNames.contains(pk), s"primary key $pk not in schema")
    }
    val cols = schema.fields.map { f =>
      val pk = if (primaryKey.contains(f.name)) " PRIMARY KEY" else ""
      val nn = if (!f.nullable && !primaryKey.contains(f.name)) " NOT NULL" else ""
      s"    ${quoted(f.name)} ${sqlType(f.dataType, varcharWidth)}$pk$nn"
    }
    val ine = if (ifNotExists) " IF NOT EXISTS" else ""
    s"CREATE TABLE$ine $table\n(\n${cols.mkString(",\n")}\n);"
  }

  def dropTableSql(table: String): String = s"DROP TABLE IF EXISTS $table;"

  /** Column identifiers are always double-quoted: reference schemas use
    * reserved words as column names (`date`, `year`, `month`, `day` —
    * `sql/create_tables.sql`), and a quoted lowercase identifier means the
    * same thing as unquoted on Redshift/Postgres while keeping strict
    * dialects (Derby) parsing.
    */
  private def quoted(name: String): String = {
    require(!name.contains("\""), s"unquotable identifier: $name")
    s""""$name""""
  }

  /** Parameterized INSERT (the reference's `insert_*.sql` shape) — one
    * placeholder per column, driver-agnostic `?` markers.
    */
  def insertSql(table: String, schema: StructType): String = {
    val names = schema.fieldNames.map(quoted)
    s"INSERT INTO $table (${names.mkString(", ")})\nVALUES (${names.map(_ => "?").mkString(", ")})"
  }

  /** Warehouse bulk-load statement (Redshift-analog COPY). The credential
    * clause is injected by the caller (e.g. "IAM_ROLE 'arn:...'"), never
    * built here.
    */
  def copySql(table: String, sourceUri: String, format: String, credentialClause: String): String = {
    require(Seq("JSON", "PARQUET", "CSV").contains(format.toUpperCase),
      s"unsupported COPY format $format")
    val fmt = format.toUpperCase match {
      case "JSON" => "FORMAT AS JSON 'auto'"
      case f      => s"FORMAT AS $f"
    }
    s"""COPY $table
       |FROM '$sourceUri'
       |$credentialClause
       |$fmt""".stripMargin
  }

  /** Row-count quality gate for a partition key (the reference checked
    * `count(*) > 0 WHERE date = %s` after each daily load).
    */
  def rowCountCheckSql(table: String, keyCol: String): String =
    s"""SELECT count(*) AS n FROM $table WHERE ${quoted(keyCol)} = ?"""

  /** Stage a DataFrame for COPY: write gzipped JSONL at `stagingPath` and
    * return the COPY statement to load it — the reference's
    * write-summary-then-COPY flow (`tweets.py:82` + `:123-133`) as one call.
    */
  def stageForCopy(
      df: DataFrame, table: String, stagingPath: String, credentialClause: String): String = {
    JsonlGz.write(df, stagingPath)
    copySql(table, stagingPath, "JSON", credentialClause)
  }
}
