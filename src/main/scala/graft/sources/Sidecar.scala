package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for underscore-prefixed sidecar dirs (`_stats`, `_centroids`,
  * `_books`, `_occupancy` — the index family's self-contained metadata).
  * A dir-scan read (`spark.read.parquet("…/_stats")`) trips the
  * datasource's hidden-path filter on the "_"-prefixed dir name and logs
  * `WARN DataSource: All paths were ignored` on EVERY probe (r12 verdict
  * #4 — harmless, but it buried every bench tail in noise). Listing the
  * part files driver-side and passing them explicitly keeps the read
  * silent; sidecars are tiny (one coalesced file), so the listing is one
  * metadata RPC that the read would have paid anyway.
  */
object Sidecar {

  def read(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    require(files.nonEmpty, s"sidecar $dir holds no parquet files")
    spark.read.parquet(files: _*)
  }
}
