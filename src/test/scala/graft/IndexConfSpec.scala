package graft

import graft.sources.IndexConf

import java.nio.file.Files

class IndexConfSpec extends SparkTestBase {
  import spark.implicits._

  test("first ensure stamps; same params revalidate; changed params fail naming the key") {
    val dir = Files.createTempDirectory("iconf").toString
    val conf = Map("n" -> "3", "bands" -> "32")
    IndexConf.ensure(spark, dir, conf, "test index")
    assert(IndexConf.read(spark, dir).contains(conf))
    // idempotent under the same parameters
    IndexConf.ensure(spark, dir, conf, "test index")
    val err = intercept[IllegalStateException] {
      IndexConf.ensure(spark, dir, Map("n" -> "5", "bands" -> "32"), "test index")
    }
    assert(err.getMessage.contains("n: index=3 caller=5"))
    assert(err.getMessage.contains("test index"))
    // a missing/extra key is a mismatch too (the parameter SURFACE drifted)
    val err2 = intercept[IllegalStateException] {
      IndexConf.ensure(spark, dir, Map("n" -> "3"), "test index")
    }
    assert(err2.getMessage.contains("bands: index=32 caller=<absent>"))
  }

  test("migration: a pre-stamp index with data is stamped on first touch") {
    val dir = Files.createTempDirectory("iconf_legacy").toString
    // a legacy index: data, no _conf
    Seq((1L, 2L)).toDF("a", "b").write.parquet(s"$dir/keys")
    assert(IndexConf.read(spark, dir).isEmpty)
    IndexConf.ensure(spark, dir, Map("maxHamming" -> "4"), "test index")
    assert(IndexConf.read(spark, dir).contains(Map("maxHamming" -> "4")))
    // and from then on the stamp binds
    intercept[IllegalStateException] {
      IndexConf.ensure(spark, dir, Map("maxHamming" -> "5"), "test index")
    }
  }

  test("racing first stamps: exactly one wins, a differing loser fails loudly") {
    val dir = Files.createTempDirectory("iconf_race").toString
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, Unit]]()
    val threads = (0 until 4).map { i =>
      val conf = Map("n" -> (if (i % 2 == 0) "3" else "5"))
      new Thread(() =>
        try { IndexConf.ensure(spark, dir, conf, "test index"); results.add(Right(())) }
        catch { case e: IllegalStateException => results.add(Left(e.getMessage)) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val (losers, winners) = results.asScala.toSeq.partition(_.isLeft)
    // whichever value won, its two callers succeed and the other two fail —
    // never a torn stamp, never four silent successes
    assert(winners.size == 2 && losers.size == 2)
    val stamped = IndexConf.read(spark, dir).get("n")
    assert(stamped == "3" || stamped == "5")
    losers.foreach(l => assert(l.swap.exists(_.contains("different layout parameters"))))
  }

  test("values may contain '='; newlines and '=' in keys are rejected") {
    val dir = Files.createTempDirectory("iconf_vals").toString
    IndexConf.ensure(spark, dir, Map("expr" -> "a=b"), "test index")
    assert(IndexConf.read(spark, dir).contains(Map("expr" -> "a=b")))
    intercept[IllegalArgumentException] {
      IndexConf.ensure(spark, Files.createTempDirectory("iconf_bad").toString,
        Map("k=x" -> "1"), "test index")
    }
    intercept[IllegalArgumentException] {
      IndexConf.ensure(spark, Files.createTempDirectory("iconf_bad2").toString,
        Map("k" -> "1\n2"), "test index")
    }
  }
}
