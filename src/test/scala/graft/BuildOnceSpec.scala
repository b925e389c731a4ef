package graft

import graft.operators.{Bm25, BuildOnce}

/** The centralized build-once cache (r11 verdict #8): the key contract,
  * the loud parameter check, and the opt-in content fingerprint now live
  * in ONE place — asserted here through the Bm25 artifact (the cheapest
  * of the three delegating call sites; Pq and Graph share the exact same
  * [[graft.operators.BuildOnce]] instance semantics).
  */
class BuildOnceSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(marker: String) = Seq(
    (0L, s"alpha bravo $marker words words", "en"),
    (1L, "charlie delta echo foxtrot", "en"),
    (2L, s"alpha $marker golf hotel india", "en")).toDF("doc_id", "text", "lang")

  test("same path + changed corpus: trusting mode serves stale, fingerprinted mode rebuilds") {
    val path = java.nio.file.Files.createTempDirectory("once_fp").toString + "/idx"
    val first = corpus("one")
    val mutated = corpus("two") // same ids, different text — the silent case

    // trusting mode (the documented key contract): the mutated corpus is
    // the caller's bug — the FIRST build keeps being served
    val a = Bm25.writeIndexOnce(first, path)
    val b = Bm25.writeIndexOnce(mutated, path)
    assert(a eq b, "path-trusting mode must serve the cached handle")

    // fingerprinted mode catches it: the content digest folds into the
    // key, so the mutated corpus is a MISS and rebuilds at the path
    val fpPath = java.nio.file.Files.createTempDirectory("once_fp2").toString + "/idx"
    val fa = Bm25.writeIndexOnce(first, fpPath, fingerprintBy = Some("doc_id, text"))
    val fSame = Bm25.writeIndexOnce(first, fpPath, fingerprintBy = Some("doc_id, text"))
    assert(fa eq fSame, "unchanged corpus must still amortize under fingerprinting")
    val fb = Bm25.writeIndexOnce(mutated, fpPath, fingerprintBy = Some("doc_id, text"))
    assert(!(fa eq fb), "a mutated corpus at the same path must rebuild")
    // and the rebuilt artifact reflects the MUTATED corpus: the marker
    // term of the second corpus is retrievable through the fresh handle
    val hits = Bm25.retrieveIndexed(fb, spark, terms = Seq("two"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits.nonEmpty, "rebuilt index must serve the mutated corpus's terms")
  }

  test("a cache hit with different build parameters fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("once_params").toString + "/idx"
    Bm25.writeIndexOnce(corpus("one"), path, buckets = 16)
    val err = intercept[IllegalArgumentException] {
      Bm25.writeIndexOnce(corpus("one"), path, buckets = 32)
    }
    assert(err.getMessage.contains("buckets=16") && err.getMessage.contains("buckets=32"),
      s"mismatch message must name both parameter sets: ${err.getMessage}")
  }

  test("fingerprint digest: order-independent, content-sensitive, empty-safe") {
    val f1 = BuildOnce.fingerprint(corpus("one"), "doc_id, text")
    val f1shuffled = BuildOnce.fingerprint(
      corpus("one").orderBy($"doc_id".desc).repartition(7), "doc_id, text")
    assert(f1 == f1shuffled, "digest must not depend on row order or partitioning")
    assert(f1 != BuildOnce.fingerprint(corpus("two"), "doc_id, text"))
    val empty = BuildOnce.fingerprint(
      corpus("one").filter($"doc_id" < 0), "doc_id, text")
    assert(empty.startsWith("n=0,"))
  }

  test("fingerprint digest is multiplicity-sensitive (xor would cancel even copies)") {
    // {A, X, X} vs {A, Y, Y}: same row count, and a bit_xor fold cancels
    // the duplicated pair on both sides — the r12 ADVICE case; the sum
    // fold must tell them apart, and must also see one-more-copy
    val a = Seq((0L, "alpha"), (1L, "xx"), (1L, "xx")).toDF("doc_id", "text")
    val b = Seq((0L, "alpha"), (2L, "yy"), (2L, "yy")).toDF("doc_id", "text")
    val c = Seq((0L, "alpha"), (1L, "xx"), (1L, "xx"), (1L, "xx"))
      .toDF("doc_id", "text")
    assert(BuildOnce.fingerprint(a, "doc_id, text")
      != BuildOnce.fingerprint(b, "doc_id, text"))
    assert(BuildOnce.fingerprint(a, "doc_id, text")
      != BuildOnce.fingerprint(c, "doc_id, text"))
  }

  test("fingerprinted rebuild never aliases an earlier handle's artifact") {
    // corpus A, then B (rebuild), then A again: the A handle must come
    // back from cache with its OWN on-disk postings still intact — the
    // r12 ADVICE failure was a bare-path rebuild leaving A's in-memory
    // stats pointing at B's data
    val path = java.nio.file.Files.createTempDirectory("once_alias").toString + "/idx"
    val fpBy = Some("doc_id, text")
    val fa = Bm25.writeIndexOnce(corpus("one"), path, fingerprintBy = fpBy)
    val fb = Bm25.writeIndexOnce(corpus("two"), path, fingerprintBy = fpBy)
    assert(fa.path != fb.path, "each content version must own a distinct path")
    val fa2 = Bm25.writeIndexOnce(corpus("one"), path, fingerprintBy = fpBy)
    assert(fa2 eq fa, "corpus A again must hit the cache")
    val hitsA = Bm25.retrieveIndexed(fa2, spark, terms = Seq("one"))
      .select("doc_id").as[Long].collect().toSet
    assert(hitsA.nonEmpty,
      "the A handle must still serve corpus A's terms after B's rebuild")
    val hitsB = Bm25.retrieveIndexed(fb, spark, terms = Seq("two"))
      .select("doc_id").as[Long].collect().toSet
    assert(hitsB.nonEmpty)
  }

  test("builds run OUTSIDE the map lock: two different keys build concurrently") {
    val cache = new BuildOnce[String]("spec-concurrent", (_, _) => (), identity)
    // each build parks until BOTH builds have started — only possible if
    // neither holds a lock the other needs (the r12 verdict #1 hazard:
    // building inside computeIfAbsent held the CHM bin lock for the whole
    // build, so same-stripe keys serialized and this rendezvous deadlocked)
    val started = new java.util.concurrent.CountDownLatch(2)
    def build(v: String): String = {
      started.countDown()
      if (!started.await(10, java.util.concurrent.TimeUnit.SECONDS))
        throw new IllegalStateException(
          "peer build never started — builds are serialized by a shared lock")
      v
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = cache.getOrBuild(spark, "k1", "p", build("v1"))
      })
      val f2 = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = cache.getOrBuild(spark, "k2", "p", build("v2"))
      })
      assert(f1.get(30, java.util.concurrent.TimeUnit.SECONDS) == "v1")
      assert(f2.get(30, java.util.concurrent.TimeUnit.SECONDS) == "v2")
    } finally pool.shutdownNow()
  }

  test("same-key race: exactly one build runs, every caller gets its value") {
    val cache = new BuildOnce[String]("spec-race", (_, _) => (), identity)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = cache.getOrBuild(spark, "shared", "p", {
            builds.incrementAndGet()
            Thread.sleep(100) // widen the race window
            "the-one-build"
          })
        })
      }
      futures.foreach(f =>
        assert(f.get(30, java.util.concurrent.TimeUnit.SECONDS) == "the-one-build"))
      assert(builds.get() == 1, s"expected one build, ran ${builds.get()}")
    } finally pool.shutdownNow()
  }
}
