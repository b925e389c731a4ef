package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Defaults are chosen for the local[32] test harness but every knob is the
  * one you would also set on a 1000-executor cluster: AQE re-plans shuffles
  * at runtime (partition coalescing + skew-join splitting), broadcast
  * threshold keeps star-schema dims out of the shuffle, and shuffle
  * partition count is sized to the parallelism actually available instead
  * of the 200 default.
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Cluster profile: the additional knobs a 1000-executor / 100 TB
    * deployment sets on top of [[builder]]'s. Shuffle partition count
    * should be ≈ 2–3× total executor cores (here parameterized);
    * `maxPartitionBytes` keeps scan tasks ≈256 MB so a 100 TB input yields
    * ~400k tasks rather than 4M; advisory partition size gives AQE a
    * target when coalescing post-shuffle partitions; dynamic allocation
    * (with shuffle tracking, no external shuffle service needed on K8s)
    * rides the job's natural parallelism curve.
    */
  def clusterBuilder(shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.dynamicAllocation.enabled", "true")
      .config("spark.dynamicAllocation.shuffleTracking.enabled", "true")
}
