package graft

import graft.sources.ShardedExport
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ShardedExportSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (1L to 100L)
    .map(i => (i, s"alpha beta doc number $i content"))
    .toDF("doc_id", "text")

  test("deterministic shards, exact manifest, pruned single-shard read, digest catches loss") {
    val path = Files.createTempDirectory("shards").toString
    val m1 = ShardedExport.write(corpus, "doc_id", "text", path, docsPerShard = 30)
      .orderBy("shard").collect()

    // 100 docs / 30 per shard = 4 shards; counts and ordinal ranges tile
    assert(m1.map(_.getAs[Long]("n_docs")).toSeq == Seq(30L, 30L, 30L, 10L))
    assert(m1.map(r => (r.getAs[Long]("first_ordinal"), r.getAs[Long]("last_ordinal")))
      .toSeq == Seq((0L, 29L), (30L, 59L), (60L, 89L), (90L, 99L)))
    assert(m1.map(_.getAs[Long]("n_tokens")).sum == 600L)

    // shard membership is a pure function of ids: a rewrite is bit-identical
    val path2 = Files.createTempDirectory("shards2").toString
    val m2 = ShardedExport.write(corpus, "doc_id", "text", path2, docsPerShard = 30)
      .orderBy("shard").collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)

    // union of shards = corpus, no dup, no loss
    val all = spark.read.parquet(s"$path/data").select($"doc_id").as[Long].collect()
    assert(all.sorted.toSeq == (1L to 100L))

    // single-shard read prunes to that shard's files at planning time
    val one = ShardedExport.readShard(spark, path, 2)
    assert(one.collect().length == 30) // materialize THIS dataset's plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    val scanned = scans(one.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    val total = spark.read.parquet(s"$path/data").inputFiles.length
    assert(scanned > 0 && scanned < total,
      s"pruned scan read $scanned of $total files")

    // verify: green, then a duplicated row flips exactly that shard red
    assert(ShardedExport.verify(spark, path, "doc_id")
      .agg(min($"ok")).as[Boolean].collect().head)
    spark.read.parquet(s"$path/data").filter($"shard" === 1).limit(1)
      .drop("shard").withColumn("shard", lit(1))
      .write.mode("append").partitionBy("shard").parquet(s"$path/data")
    val after = ShardedExport.verify(spark, path, "doc_id")
      .select($"shard".cast("int"), $"ok").as[(Int, Boolean)].collect().toMap
    assert(!after(1) && after(0) && after(2) && after(3))
  }

  test("readSlice: disjoint covering rank slices, shard-modulo mapping, pruned scan") {
    val docs = (1L to 100L).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("shards_slice").toString + "/e"
    ShardedExport.write(docs, "doc_id", "text", path, docsPerShard = 25) // shards 0..3
    val slices = (0 until 3).map(r =>
      ShardedExport.readSlice(spark, path, r, 3)
        .select($"doc_id").as[Long].collect().toSet)
    // disjoint + covering across ranks
    assert(slices.map(_.size).sum == 100)
    assert(slices.reduce(_ ++ _).size == 100)
    // rank r holds exactly the shards ≡ r (mod 3): rank 1 of 3 = shard 1
    val shard1 = ShardedExport.readShard(spark, path, 1)
      .select($"doc_id").as[Long].collect().toSet
    assert(slices(1) == shard1)
    // and the slice scan opens only its shards' files
    val sl = ShardedExport.readSlice(spark, path, 1, 3)
    assert(sl.collect().length == 25)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    val scanned = scans(sl.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    val total = spark.read.parquet(s"$path/data").inputFiles.length
    assert(scanned > 0 && scanned < total, s"slice read $scanned of $total files")
    intercept[IllegalArgumentException](ShardedExport.readSlice(spark, path, 3, 3))
  }
}
