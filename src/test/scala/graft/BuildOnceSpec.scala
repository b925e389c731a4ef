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

  test("a superseding rebuild reaps the old version dir; re-asking rebuilds fresh, never aliased") {
    // corpus A, then B: B's build SUPERSEDES A in this session — A's
    // version dir is GC'd (r13 verdict #3: without in-session GC a daily
    // mutating corpus abandons one version dir per day) — and versions
    // still never alias (each digest owns its own sibling path; the r12
    // ADVICE failure was a bare-path rebuild leaving A's in-memory stats
    // pointing at B's data)
    val path = java.nio.file.Files.createTempDirectory("once_alias").toString + "/idx"
    val fpBy = Some("doc_id, text")
    val fa = Bm25.writeIndexOnce(corpus("one"), path, fingerprintBy = fpBy)
    assert(new java.io.File(fa.path).exists())
    val fb = Bm25.writeIndexOnce(corpus("two"), path, fingerprintBy = fpBy)
    assert(fa.path != fb.path, "each content version must own a distinct path")
    assert(!new java.io.File(fa.path).exists(),
      "the superseded version dir must be reaped when the new build lands")
    val hitsB = Bm25.retrieveIndexed(fb, spark, terms = Seq("two"))
      .select("doc_id").as[Long].collect().toSet
    assert(hitsB.nonEmpty)
    // content flips BACK to A: same digest, but the entry was superseded
    // — a fresh rebuild at A's own versioned path, serving A's terms
    // (never B's postings under A's stats — the aliasing bug)
    val fa2 = Bm25.writeIndexOnce(corpus("one"), path, fingerprintBy = fpBy)
    assert(!(fa2 eq fa) && fa2.path == fa.path,
      "a superseded digest rebuilds fresh at its own versioned path")
    val hitsA = Bm25.retrieveIndexed(fa2, spark, terms = Seq("one"))
      .select("doc_id").as[Long].collect().toSet
    assert(hitsA.nonEmpty, "the rebuilt handle must serve corpus A's terms")
  }

  test("in-session version GC: three successive content mutations leave exactly one version dir") {
    val root = java.nio.file.Files.createTempDirectory("once_gc").toString
    val path = s"$root/idx"
    val fpBy = Some("doc_id, text")
    def versionDirs: Seq[String] = new java.io.File(root).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("idx.fp-"))
      .map(_.getName)
    val f1 = Bm25.writeIndexOnce(corpus("one"), path, fingerprintBy = fpBy)
    assert(versionDirs.size == 1)
    val f2 = Bm25.writeIndexOnce(corpus("two"), path, fingerprintBy = fpBy)
    assert(versionDirs.size == 1,
      s"mutation 2 must reap mutation 1's dir, found: $versionDirs")
    val f3 = Bm25.writeIndexOnce(corpus("three"), path, fingerprintBy = fpBy)
    assert(versionDirs.size == 1,
      s"mutation 3 must reap mutation 2's dir, found: $versionDirs")
    assert(Seq(f1.path, f2.path, f3.path).distinct.size == 3)
    assert(new java.io.File(f3.path).exists())
    // the survivor serves the LATEST content, and still amortizes
    val hits = Bm25.retrieveIndexed(f3, spark, terms = Seq("three"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits.nonEmpty)
    assert(Bm25.writeIndexOnce(corpus("three"), path, fingerprintBy = fpBy) eq f3,
      "the current version must keep hitting the cache")
  }

  test("a dead session's same-path artifact is never reaped under a live in-flight build (intended id)") {
    // the r13 ADVICE (low) window, deterministic: a LIVE caller has
    // installed its cell and is mid-build at path P when the session that
    // built P's previous incarnation dies — a third caller's reap must
    // see the in-flight build's INTENDED id and leave P alone
    val dead = java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()
    val cache = new BuildOnce[String]("spec-intended",
      (_, v) => BuildOnce.deleteDir(v), identity, isDead = dead.contains)
    val path = java.nio.file.Files.createTempDirectory("once_intended").toString + "/artifact"
    def mk(tag: String): String = {
      val d = new java.io.File(path)
      d.mkdirs(); new java.io.File(d, tag).createNewFile(); path
    }
    val s1 = spark.newSession()
    cache.getOrBuild(s1, "k-old", "p", mk("v1"))

    val inBuild = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = cache.getOrBuild(spark, "k-new", "p", {
          mk("v2"); inBuild.countDown()
          release.await(10, java.util.concurrent.TimeUnit.SECONDS); path
        }, intendedId = Some(path))
      })
      assert(inBuild.await(10, java.util.concurrent.TimeUnit.SECONDS))
      dead.add(s1) // s1 dies while the rebuild is mid-flight
      // an unrelated caller triggers the reap pass
      cache.getOrBuild(spark, "k-bystander", "p", "unrelated")
      assert(new java.io.File(path, "v2").exists(),
        "reap deleted a path a live build had declared as its intended artifact")
      release.countDown()
      assert(fut.get(30, java.util.concurrent.TimeUnit.SECONDS) == path)
      assert(new java.io.File(path, "v2").exists())
    } finally pool.shutdownNow()
  }

  test("dead session + racing rebuild callers: the rebuilt artifact survives every interleave") {
    // the r13 verdict #2 race: after a session death, two concurrent
    // callers — one reaping the dead entry, one rebuilding at the same
    // path — used to interleave so the reaper deleted the fresh build's
    // output. Reap + install are now serialized; stress the interleave.
    for (round <- 1 to 15) {
      val dead = java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()
      val cache = new BuildOnce[String]("spec-reap-race",
        (_, v) => BuildOnce.deleteDir(v), identity, isDead = dead.contains)
      val path = java.nio.file.Files.createTempDirectory(s"once_race$round")
        .toString + "/artifact"
      def mk(tag: String): String = {
        val d = new java.io.File(path)
        d.mkdirs(); new java.io.File(d, tag).createNewFile(); path
      }
      val s1 = spark.newSession()
      cache.getOrBuild(s1, "k-dead", "p", mk("old"))
      dead.add(s1)

      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val rebuild = pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = cache.getOrBuild(spark, "k-rebuild", "p", {
            mk("fresh"); Thread.sleep(10); path
          }, intendedId = Some(path))
        })
        val bystander = pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = cache.getOrBuild(spark, s"k-by$round", "p", "x")
        })
        assert(rebuild.get(30, java.util.concurrent.TimeUnit.SECONDS) == path)
        bystander.get(30, java.util.concurrent.TimeUnit.SECONDS)
        assert(new java.io.File(path, "fresh").exists(),
          s"round $round: the rebuilt artifact was deleted by a racing reap")
      } finally pool.shutdownNow()
    }
  }

  test("a slow artifact delete does not block unrelated installs (reaps run outside the monitor)") {
    // the r14 residue (b): reap callbacks (artifact deletes, Graph's DROP
    // TABLE) used to run UNDER the cache monitor — a slow delete blocked
    // every unrelated same-cache install for its duration. Now the
    // decision tombstones under the monitor and the delete runs outside:
    // park a delete on a latch and assert an unrelated getOrBuild
    // completes while it is still in flight.
    val dead = java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()
    val reapStarted = new java.util.concurrent.CountDownLatch(1)
    val reapRelease = new java.util.concurrent.CountDownLatch(1)
    val cache = new BuildOnce[String]("spec-slow-reap",
      (_, _) => {
        reapStarted.countDown()
        assert(reapRelease.await(20, java.util.concurrent.TimeUnit.SECONDS))
      }, identity, isDead = dead.contains)
    val s1 = spark.newSession()
    cache.getOrBuild(s1, "k-dead", "p", "dead-artifact")
    dead.add(s1)

    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val trigger = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = cache.getOrBuild(spark, "k-trigger", "p", "t")
      })
      assert(reapStarted.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // the delete is parked — an unrelated install must not queue on it
      val unrelated = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = cache.getOrBuild(
          spark, "k-unrelated", "p", "u", intendedId = Some("other-path"))
      })
      assert(unrelated.get(5, java.util.concurrent.TimeUnit.SECONDS) == "u",
        "an unrelated install blocked behind an in-flight artifact delete")
      assert(!trigger.isDone, "the reaping caller itself must still be parked")
      reapRelease.countDown()
      assert(trigger.get(20, java.util.concurrent.TimeUnit.SECONDS) == "t")
    } finally pool.shutdownNow()
  }

  test("an install at a tombstoned path waits out the delete (no-delete-under-build preserved)") {
    // the guarantee the monitor used to provide for free must survive the
    // delete moving outside it: a caller whose intendedId names an
    // artifact being deleted RIGHT NOW must not start building until the
    // delete finishes — else the delete lands on the fresh build's files.
    val dead = java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reapStarted = new java.util.concurrent.CountDownLatch(1)
    val reapRelease = new java.util.concurrent.CountDownLatch(1)
    val cache = new BuildOnce[String]("spec-tombstone",
      (_, _) => {
        reapStarted.countDown()
        assert(reapRelease.await(20, java.util.concurrent.TimeUnit.SECONDS))
        events.add("delete-done")
      }, identity, isDead = dead.contains)
    val s1 = spark.newSession()
    cache.getOrBuild(s1, "k-dead", "p", "P")
    dead.add(s1)

    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val trigger = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = cache.getOrBuild(spark, "k-trigger", "p", "t")
      })
      assert(reapStarted.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // same-path rebuild while the delete of P is parked: must wait
      val samePath = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = cache.getOrBuild(spark, "k-rebuild", "p", {
          events.add("build-ran"); "P"
        }, intendedId = Some("P"))
      })
      Thread.sleep(300)
      assert(!samePath.isDone,
        "a same-path install must wait for the in-flight delete")
      assert(!events.contains("build-ran"),
        "the fresh build started while its path was still being deleted")
      reapRelease.countDown()
      assert(samePath.get(20, java.util.concurrent.TimeUnit.SECONDS) == "P")
      assert(trigger.get(20, java.util.concurrent.TimeUnit.SECONDS) == "t")
      import scala.jdk.CollectionConverters._
      assert(events.asScala.toSeq == Seq("delete-done", "build-ran"),
        s"delete must strictly precede the same-path build: ${events.asScala.toSeq}")
    } finally pool.shutdownNow()
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

  test("racing content versions never reap each other; the next version GCs both") {
    // two threads of one session fingerprint a mutating corpus: A
    // installs version 1 and is still BUILDING when B installs and
    // completes version 2. Pre-fix, B's supersede evicted A's in-flight
    // entry (dropping its intendedId protection and orphaning its dir),
    // and A's later supersede deleted B's artifact out from under B's
    // live handle. Rule now: only LATER-installed versions reap, and
    // in-flight cells are skipped.
    import scala.jdk.CollectionConverters._
    val reaped = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val cache = new BuildOnce[String]("spec-version-race",
      (_, v) => { reaped.add(v); () }, identity)
    val aInstalled = new java.util.concurrent.CountDownLatch(1)
    val aGate = new java.util.concurrent.CountDownLatch(1)
    val prefix = BuildOnce.supersedesPrefix("p")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val a = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = cache.getOrBuild(
          spark, BuildOnce.versionKey("p", "1"), "x", {
            aInstalled.countDown()
            assert(aGate.await(20, java.util.concurrent.TimeUnit.SECONDS))
            "A"
          }, supersedes = Some(prefix))
      })
      assert(aInstalled.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // B installs LATER and completes while A is mid-build: A's entry
      // is in flight — B must skip it (no eviction, no reap)
      val b = cache.getOrBuild(spark, BuildOnce.versionKey("p", "2"), "x",
        "B", supersedes = Some(prefix))
      assert(b == "B" && reaped.isEmpty,
        s"B reaped the in-flight older version: ${reaped.asScala.toSeq}")
      // A finishes LAST: B installed after A, so A must not reap it
      aGate.countDown()
      assert(a.get(20, java.util.concurrent.TimeUnit.SECONDS) == "A")
      assert(reaped.isEmpty,
        s"the earlier version reaped the later one: ${reaped.asScala.toSeq}")
      // a third version now supersedes BOTH built predecessors
      val c = cache.getOrBuild(spark, BuildOnce.versionKey("p", "3"), "x",
        "C", supersedes = Some(prefix))
      assert(c == "C")
      assert(reaped.asScala.toSet == Set("A", "B"),
        s"the next version must GC both: ${reaped.asScala.toSeq}")
    } finally pool.shutdownNow()
  }

  test("a caller key that merely starts with bare+'#' is not evicted as a content version") {
    // the documented "fold the date into the key" pattern collides with
    // a bare '#' version separator: key `edges#2026-08-15` starts with
    // prefix `edges#`, so a fingerprinted build of bare key `edges`
    // would evict it and DROP its live artifact. versionKey/
    // supersedesPrefix use `#v=`, which no date-folded key produces.
    import scala.jdk.CollectionConverters._
    val reaped = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val cache = new BuildOnce[String]("spec-prefix",
      (_, v) => { reaped.add(v); () }, identity)
    assert(cache.getOrBuild(spark, "edges#2026-08-15", "x", "D") == "D")
    assert(cache.getOrBuild(spark, BuildOnce.versionKey("edges", "f1"), "x",
      "V1", supersedes = Some(BuildOnce.supersedesPrefix("edges"))) == "V1")
    assert(reaped.isEmpty,
      s"the date-keyed neighbor was evicted as a version: ${reaped.asScala.toSeq}")
    // the neighbor's entry survived — its cached value still serves
    var rebuilt = false
    assert(cache.getOrBuild(spark, "edges#2026-08-15", "x",
      { rebuilt = true; "D2" }) == "D")
    assert(!rebuilt, "the date-keyed entry was evicted and rebuilt")
    // while a REAL older content version is still GC'd
    assert(cache.getOrBuild(spark, BuildOnce.versionKey("edges", "f2"), "x",
      "V2", supersedes = Some(BuildOnce.supersedesPrefix("edges"))) == "V2")
    assert(reaped.asScala.toSeq == Seq("V1"))
  }
}
