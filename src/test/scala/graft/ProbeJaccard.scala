package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

import scala.util.Random

/** Scratch probe (test scope): full-index vs prefix-filtered exact Jaccard
  * on a boilerplate-heavy corpus — the hot-shingle regime the prefix
  * variant exists for. Prints wall times and candidate counts.
  */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(5000)
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new Random(5)
    val vocab = Vector.tabulate(400)(i => s"w$i")
    val boiler = "subscribe to our newsletter for daily updates and offers"
    val docs = (0 until nDocs).map { i =>
      val tail = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text").cache()
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
    }
    // warm
    Dedup.ngramJaccardPairs(docs.limit(200), "doc_id", "text").count()
    Dedup.ngramJaccardPairsPrefix(docs.limit(200), "doc_id", "text").count()

    time("full-index")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("prefix    ")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text").count())
    spark.stop()
  }
}
