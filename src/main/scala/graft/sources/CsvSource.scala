package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV reader with explicit schema + corrupt-record quarantine — the CSV
  * sibling of [[JsonlGz]] (the reference's market feed was CSV-shaped
  * quandl data, `market.py:24-41`).
  *
  * Same policies as JsonlGz: never infer schema at scale (extra full
  * pass), never drop bad lines silently. The CSV file source tolerates
  * corrupt-column-only queries less gracefully than JSON too, so the
  * corrupt column is only trustworthy when selected alongside data
  * columns; [[clean]]/[[corrupt]] do that correctly.
  */
object CsvSource {

  val CorruptCol = "_corrupt_record"

  def read(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else schema.add(StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
      // materialize the parse verdict alongside data columns so downstream
      // prunes can't reduce the scan to the corrupt column alone
      .select(col("*"))
  }

  def clean(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  def corrupt(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))

  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString)
      .option("compression", "gzip").csv(path)
}
