package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for partitioned parquet tables — the maintenance
  * job every long-running ingest needs: streaming/CDC writers
  * ([[PartitionedUpsert]], `StreamUpsert`, micro-batch appends) leave
  * partitions with many KB-sized files, and at 100 TB the resulting
  * NameNode/listing pressure and per-file open cost dominate scans long
  * before the bytes do.
  *
  * `compact` walks the table's partition directories (driver-side listing,
  * bounded by file count — the same metadata a scan would list anyway),
  * picks partitions whose file count and mean file size cross the
  * thresholds, and rewrites JUST those partitions to
  * `ceil(bytes / targetFileBytes)` files via a pruned read + dynamic
  * partition overwrite. Content is untouched (row-identical,
  * spec-asserted); untouched partitions' files are never rewritten.
  */
object Compaction {

  /** One partition's file stats. */
  final case class PartitionStats(
      partition: String, nFiles: Int, totalBytes: Long)

  /** List (partition value → stats) for a `partitionCol=value`-laid-out
    * table. Driver-side FS metadata walk, no data read.
    */
  def stats(
      spark: SparkSession, tablePath: String,
      partitionCol: String): Seq[PartitionStats] = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(tablePath)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      .map { dir =>
        val files = fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartitionStats(
          dir.getPath.getName.stripPrefix(s"$partitionCol="),
          files.size, files.map(_.getLen).sum)
      }
  }

  /** Compact partitions with more than `maxFiles` files AND mean file size
    * under `smallFileBytes`. Returns the rewritten partition values.
    */
  def compact(
      spark: SparkSession, tablePath: String, partitionCol: String,
      maxFiles: Int = 8, smallFileBytes: Long = 32L << 20,
      targetFileBytes: Long = 128L << 20): Seq[String] = {
    import spark.implicits._
    val victims = stats(spark, tablePath, partitionCol).filter(p =>
      p.nFiles > maxFiles && p.totalBytes / math.max(p.nFiles, 1) < smallFileBytes)
    if (victims.isEmpty) return Seq.empty
    val parts = victims.map(_.partition)
    // target file count PER partition (a 10 GB partition must not collapse
    // to one file): salt each row by hash mod that count, shuffle on
    // (partition, salt) — each combination becomes ~one output file
    val targets = victims.map(p => (p.partition,
      math.max(1L, math.ceil(p.totalBytes.toDouble / targetFileBytes).toLong)))
      .toDF("__part", "__nfiles")
    val slice = spark.read.parquet(tablePath)
      .filter(col(partitionCol).cast("string").isin(parts: _*))
    val dataCols = slice.columns.filterNot(_ == partitionCol).map(col)
    val compacted = slice
      .join(broadcast(targets), col(partitionCol).cast("string") === col("__part"))
      .withColumn("__salt", pmod(xxhash64(struct(dataCols: _*)), col("__nfiles")))
      .repartition(col(partitionCol), col("__salt"))
      .drop("__part", "__nfiles", "__salt")
      .localCheckpoint() // cut the read-overwrite cycle (PartitionedUpsert note)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try compacted.write.mode("overwrite").partitionBy(partitionCol).parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    parts
  }
}
