package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class InterleaveSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int, strata: Seq[String]) =
    (0 until n).map(i => (i.toLong, strata(i % strata.size)))
      .toDF("doc_id", "source")

  test("every prefix holds each stratum at its weighted rate (stride lag <= 2)") {
    // populations proportional to the weights, so no stratum exhausts
    // before the end and the rate property must hold for EVERY prefix
    val df = ((0 until 150).map(i => (i.toLong, "a"))
      ++ (200 until 290).map(i => (i.toLong, "b"))
      ++ (400 until 460).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val bp = Seq(("a", 5000), ("b", 3000), ("c", 2000))
    val out = Sampling.mixtureInterleave(df, "source", "doc_id", bp)
      .select(col("ordinal"), col("source")).as[(Long, String)]
      .collect().sortBy(_._1)
    // dense 0-based ordinals over the whole corpus
    assert(out.map(_._1).toSeq == (0L until 300L))
    for (l <- Seq(10, 40, 100, 250); (s, w) <- bp) {
      val got = out.take(l).count(_._2 == s)
      val want = l * w / 10000.0
      assert(math.abs(got - want) <= 2.0,
        s"prefix $l: $s has $got docs, want ~$want")
    }
  }

  test("a stratum that runs out stops contributing; the rest keep their rates") {
    // stratum "tiny" holds 5 docs at 50% weight -> exhausted by ~ordinal 10
    val df = (0L until 5L).map(i => (i, "tiny"))
      .++((100L until 200L).map(i => (i, "big"))).toDF("doc_id", "source")
    val out = Sampling
      .mixtureInterleave(df, "source", "doc_id", Seq(("tiny", 5000), ("big", 5000)))
      .select(col("ordinal"), col("source")).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(out.length == 105 && out.map(_._1).toSeq == (0L until 105L))
    // all 5 tiny docs appear in the first ~11 positions (strides 1,3,5,7,9
    // on the 10^6-scaled grid interleave 1:1 with big's first 5)
    assert(out.take(11).count(_._2 == "tiny") == 5)
    assert(out.drop(20).forall(_._2 == "big"))
  }

  test("order is partitioning-independent and a pure function of ids") {
    val df = corpus(120, Seq("x", "y"))
    val bp = Seq(("x", 7000), ("y", 3000))
    def run(parts: Int) = Sampling
      .mixtureInterleave(df.repartition(parts), "source", "doc_id", bp, buckets = 16)
      .select(col("doc_id"), col("ordinal")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(run(7) == run(2))
  }

  test("weights must cover every stratum and sum to 10000") {
    val df = corpus(20, Seq("a", "b"))
    intercept[IllegalArgumentException] {
      Sampling.mixtureInterleave(df, "source", "doc_id", Seq(("a", 10000)))
        .collect()
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureInterleave(df, "source", "doc_id",
        Seq(("a", 5000), ("b", 4000)))
    }
  }
}
