package graft

import graft.operators.{Bm25, Pq}
import graft.sources.BuildLock

/** Cross-JVM build coordination for the path-addressed amortized index
  * builders (r14 verdict #1). Two SESSIONS of one JVM are the test's
  * "two JVMs": their BuildOnce caches are disjoint (the cache key is the
  * session), so without the lease both would build — exactly the
  * nightly-DAG-plus-ad-hoc-session shape, minus the process boundary the
  * filesystem lock doesn't care about.
  */
class BuildLockSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(s: org.apache.spark.sql.SparkSession) = {
    val sq = s
    import sq.implicits._
    Seq(
      (0L, "alpha bravo charlie words words", "en"),
      (1L, "charlie delta echo foxtrot", "en"),
      (2L, "alpha golf hotel india alpha", "en"),
      (3L, "bravo bravo juliet kilo", "de")).toDF("doc_id", "text", "lang")
  }

  private def walkFiles(dir: String): Set[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).map(f => (f.getPath, f.lastModified)).toSet
  }

  test("two concurrent sessions, one shared path: exactly one BM25 build runs; the waiter serves the winner's artifact untouched") {
    val path = java.nio.file.Files.createTempDirectory("lock_bm25").toString + "/idx"
    val s2 = spark.newSession()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Bm25.Bm25Index] {
        def call(): Bm25.Bm25Index = Bm25.writeIndexOnce(docs(spark), path)
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Bm25.Bm25Index] {
        def call(): Bm25.Bm25Index = Bm25.writeIndexOnce(docs(s2), path)
      })
      val (a, b) = (fa.get(120, java.util.concurrent.TimeUnit.SECONDS),
        fb.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // both handles describe ONE artifact (same stats), and the on-disk
      // data dir holds exactly one build: every data file's name carries
      // its write attempt's UUID, so a double-build would leave either
      // extra part files (append) or fresher mtimes (overwrite) — the
      // waiter must have taken the read path, not rebuilt
      assert(a.n == b.n && a.tt == b.tt && a.buckets == b.buckets)
      val probe = (i: Bm25.Bm25Index) =>
        Bm25.retrieveIndexed(i, spark, terms = Seq("alpha", "bravo"), k = 3)
          .as[(String, Long, Double, Int)].collect().toSet
      assert(probe(a) == probe(b) && probe(a).nonEmpty)
      // the lease is released once both calls return
      assert(!new java.io.File(BuildLock.lockPath(path).toUri.getPath).exists())
    } finally pool.shutdownNow()
  }

  test("a second session against a completed artifact reads it without touching a byte") {
    val path = java.nio.file.Files.createTempDirectory("lock_read").toString + "/idx"
    val a = Bm25.writeIndexOnce(docs(spark), path)
    val before = walkFiles(path)
    val s2 = spark.newSession()
    val b = Bm25.writeIndexOnce(docs(s2), path)
    assert(walkFiles(path) == before,
      "the waiter's read path must not rewrite the winner's artifact")
    assert(a.n == b.n && a.tt == b.tt)
    // layout disagreement between same-path producers fails loudly
    // instead of silently serving the winner's layout
    val s3 = spark.newSession()
    val err = intercept[IllegalArgumentException] {
      Bm25.writeIndexOnce(docs(s3), path, buckets = 17)
    }
    assert(err.getMessage.contains("buckets"))
  }

  test("two concurrent sessions, one shared path: exactly one IVF-PQ train+build runs (the trainer thunk is the witness)") {
    val path = java.nio.file.Files.createTempDirectory("lock_pq").toString + "/idx"
    val emb = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint()
    val trains = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(s: org.apache.spark.sql.SparkSession): Pq.IvfPqIndex =
      Pq.writeIndexOnce(emb, "vec_id", "embedding",
        { trains.incrementAndGet(); Pq.train(emb, "vec_id", "embedding", m = 4, k = 8) },
        path, nlist = 4)
    val s2 = spark.newSession()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Pq.IvfPqIndex] {
        def call(): Pq.IvfPqIndex = build(spark)
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Pq.IvfPqIndex] {
        def call(): Pq.IvfPqIndex = build(s2)
      })
      val (a, b) = (fa.get(120, java.util.concurrent.TimeUnit.SECONDS),
        fb.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // the model is only trained by the winner; the waiter reads the
      // persisted centroids/books instead (the by-name thunk is the
      // witness that no second build started)
      assert(trains.get() == 1,
        s"expected exactly one train, saw ${trains.get()}")
      assert(a.centroids.length == b.centroids.length)
      assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    } finally pool.shutdownNow()
    // nlist disagreement on the completed artifact fails loudly
    val s3 = spark.newSession()
    val err = intercept[IllegalArgumentException] {
      Pq.writeIndexOnce(emb, "vec_id", "embedding",
        Pq.train(emb, "vec_id", "embedding", m = 4, k = 8), path, nlist = 8)
    }
    assert(err.getMessage.contains("nlist"))
  }

  test("a stale lock (crashed holder, expired lease) heals: the next builder proceeds instead of waiting forever") {
    val path = java.nio.file.Files.createTempDirectory("lock_stale").toString + "/idx"
    val lock = new java.io.File(BuildLock.lockPath(path).toUri.getPath)
    lock.getParentFile.mkdirs()
    val out = new java.io.FileOutputStream(lock)
    out.write((s"token=dead-holder\nholder=ghost:1\n" +
      s"expires=${System.currentTimeMillis() - 60000}").getBytes("UTF-8"))
    out.close()
    val idx = Bm25.writeIndexOnce(docs(spark), path)
    assert(idx.n == 4L)
    assert(!lock.exists(), "the healed-and-reacquired lease must release")
  }

  test("a torn lock (unparseable) is only healed once older than the lease; a live holder's lease is renewed, never healed") {
    val dir = java.nio.file.Files.createTempDirectory("lock_torn").toString
    val artifact = s"$dir/art"
    // torn lock, old mtime: heals and acquires
    val lock = new java.io.File(BuildLock.lockPath(artifact).toUri.getPath)
    lock.getParentFile.mkdirs()
    assert(lock.createNewFile())
    assert(lock.setLastModified(System.currentTimeMillis() - 10000))
    var ran = false
    BuildLock.withLease(spark, artifact, "test", leaseMs = 2000, pollMs = 50) {
      ran = true
    }
    assert(ran && !lock.exists())

    // a SLOW build under a SHORT lease survives a concurrent waiter: the
    // renewer keeps the lease fresh, so the waiter only enters after
    // release — never heals a live holder and never runs concurrently
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val holder = pool.submit(new Runnable {
        def run(): Unit =
          BuildLock.withLease(spark, artifact, "holder",
            leaseMs = 600, pollMs = 50) {
            events.add("holder-start")
            Thread.sleep(2500) // >4 lease periods: expiry would fire
            events.add("holder-end")
          }
      })
      Thread.sleep(200) // let the holder acquire first
      val waiter = pool.submit(new Runnable {
        def run(): Unit =
          BuildLock.withLease(spark, artifact, "waiter",
            leaseMs = 600, pollMs = 50) {
            events.add("waiter-start")
          }
      })
      holder.get(30, java.util.concurrent.TimeUnit.SECONDS)
      waiter.get(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(events.toArray.toSeq ==
        Seq("holder-start", "holder-end", "waiter-start"),
        s"lease not held exclusively: ${events.toArray.toSeq}")
    } finally pool.shutdownNow()
  }

  test("a healed-out holder's late renewals never clobber the new holder's claim, and its release leaves the claim intact (r15 verdict #1)") {
    val dir = java.nio.file.Files.createTempDirectory("lock_clobber").toString
    val artifact = s"$dir/art"
    val lock = new java.io.File(BuildLock.lockPath(artifact).toUri.getPath)
    // a NEW holder's claim, simulating a waiter that healed this holder
    // out after a full-lease driver stall and claimed the lease itself
    val foreign = s"token=new-holder-token\nholder=other:99\n" +
      s"expires=${System.currentTimeMillis() + 600000}"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val holder = pool.submit(new Runnable {
        def run(): Unit =
          BuildLock.withLease(spark, artifact, "stalled-holder",
            leaseMs = 300, pollMs = 50) {
            // while this "stalled" build runs, overwrite the lock with
            // the new holder's claim; the old renewer fires every 100 ms
            val out = new java.io.FileOutputStream(lock)
            out.write(foreign.getBytes("UTF-8"))
            out.close()
            Thread.sleep(1000) // ≥ 9 renewal periods fire against it
          }
      })
      holder.get(30, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdownNow()
    // every renewal saw the foreign token and logged instead of renewing
    // (readLock-before-rename), and release saw it and left it alone:
    // the NEW holder's token must still be on disk, byte-identical
    val content = new String(
      java.nio.file.Files.readAllBytes(lock.toPath), "UTF-8")
    assert(content == foreign,
      s"old holder's renewer or release clobbered the new claim: $content")
    // no renewal temp debris left beside the lock
    val debris = lock.getParentFile.listFiles()
      .filter(_.getName.contains(".renew."))
    assert(debris.isEmpty, s"renewal temps leaked: ${debris.mkString(",")}")
    assert(lock.delete())
  }

  test("a MUTATION lease healed out mid-body rejects its result with LeaseLostException instead of finishing unleased (r16 ADVICE, medium)") {
    val dir = java.nio.file.Files.createTempDirectory("lock_mut").toString
    val artifact = s"$dir/art"
    val lock = new java.io.File(BuildLock.lockPath(artifact).toUri.getPath)
    val foreign = s"token=new-holder-token\nholder=other:99\n" +
      s"expires=${System.currentTimeMillis() + 600000}"
    val bodyFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val holder = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long =
          BuildLock.withLease(spark, artifact, "stalled-mutator",
            leaseMs = 300, pollMs = 50, mutation = true) {
            // simulate the waiter's heal+claim while this holder stalls
            val out = new java.io.FileOutputStream(lock)
            out.write(foreign.getBytes("UTF-8"))
            out.close()
            Thread.sleep(1000) // ≥ 9 renewal ticks detect the foreign token
            bodyFinished.set(true)
            42L // the result that must NOT be handed back
          }
      })
      val ex = intercept[java.util.concurrent.ExecutionException] {
        holder.get(30, java.util.concurrent.TimeUnit.SECONDS)
      }
      assert(ex.getCause.isInstanceOf[BuildLock.LeaseLostException],
        s"expected LeaseLostException, got ${ex.getCause}")
      // the body itself ran to completion — the REJECTION is the contract
      // (a watchdog thread cannot abort a Spark job mid-body); what the
      // caller must never see is a trusted result
      assert(bodyFinished.get())
    } finally pool.shutdownNow()
    // and the healed-out mutator never clobbered the new holder's claim
    val content = new String(
      java.nio.file.Files.readAllBytes(lock.toPath), "UTF-8")
    assert(content == foreign,
      s"healed-out mutator clobbered the new claim: $content")
    assert(lock.delete())

    // control: the same mutation lease, UN-contended, returns its result
    val r = BuildLock.withLease(spark, artifact, "healthy-mutator",
      leaseMs = 300, pollMs = 50, mutation = true) { Thread.sleep(450); 7L }
    assert(r == 7L)
    assert(!lock.exists())
  }
}
