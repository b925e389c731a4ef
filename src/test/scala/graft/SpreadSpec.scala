package graft

import graft.operators.Spread
import org.apache.spark.sql.functions._

/** The r20 input-skew spread: repartitions ONLY a narrow batch input, to
  * the session's parallelism, preserving the exact row multiset; wide
  * inputs and streaming frames pass through untouched.
  */
class SpreadSpec extends SparkTestBase {

  test("a one-partition input spreads to the default parallelism") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val out = Spread.ifNarrow(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // exact multiset preserved
    assert(out.except(df).isEmpty && df.except(out).isEmpty)
    assert(out.count() == 1000)
  }

  test("an already-wide input passes through with its partitioning intact") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val df = (1 to 100).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .repartition(target)
    val out = Spread.ifNarrow(df)
    assert(out.rdd.getNumPartitions == target, "guard must not re-exchange")
    assert(out eq df, "wide input must be returned unchanged")
  }

  test("a streaming frame passes through untouched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF()
    assert(Spread.ifNarrow(df) eq df)
  }
}
