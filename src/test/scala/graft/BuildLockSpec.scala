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
    // a crashed holder's lock as it really looks: the LAST renewal wrote
    // expires = renewal + lease, and the mtime is that renewal's commit —
    // both a full lease in the past by the time a waiter probes (the
    // observer-side aging rule heals by mtime, never by trusting the
    // holder's absolute stamp — r18 verdict #1)
    out.write((s"token=dead-holder\nholder=ghost:1\n" +
      s"expires=${System.currentTimeMillis() - 60000}").getBytes("UTF-8"))
    out.close()
    assert(lock.setLastModified(
      System.currentTimeMillis() - BuildLock.DefaultLeaseMs - 60000))
    val idx = Bm25.writeIndexOnce(docs(spark), path)
    assert(idx.n == 4L)
    assert(!lock.exists(), "the healed-and-reacquired lease must release")
  }

  test("a skewed holder (expires stamps read as already past) is NOT healed while its renewals land; it heals one lease after they stop (r18 verdict #1)") {
    val dir = java.nio.file.Files.createTempDirectory("lock_skew").toString
    val artifact = s"$dir/art"
    val lock = new java.io.File(BuildLock.lockPath(artifact).toUri.getPath)
    lock.getParentFile.mkdirs()
    // a holder whose clock runs ~3 s behind the waiter's, renewing every
    // 100 ms: every stamp it commits reads as ALREADY EXPIRED under the
    // pre-fix absolute comparison — the old rule healed it out on the
    // waiter's first poll, every time, despite perfect renewals
    val renewing = new java.util.concurrent.atomic.AtomicBoolean(true)
    def skewedStamp(): Unit = {
      val out = new java.io.FileOutputStream(lock)
      out.write((s"token=skewed-holder\nholder=slowclock:7\n" +
        s"expires=${System.currentTimeMillis() - 2000}").getBytes("UTF-8"))
      out.close()
    }
    skewedStamp()
    val renewer = new Thread(() => {
      while (renewing.get()) { skewedStamp(); Thread.sleep(100) }
    })
    renewer.setDaemon(true)
    renewer.start()
    val acquiredAt = new java.util.concurrent.atomic.AtomicLong(0L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val waiter = pool.submit(new Runnable {
        def run(): Unit =
          BuildLock.withLease(spark, artifact, "skew-waiter",
            leaseMs = 1000, pollMs = 50) {
            acquiredAt.set(System.currentTimeMillis())
          }
      })
      // while renewals land the lock's mtime never ages past the bound:
      // the waiter must still be queued after ~1.5 s (≈ 30 polls — the
      // pre-fix code healed on the FIRST poll)
      Thread.sleep(1500)
      assert(acquiredAt.get() == 0L,
        "waiter healed out a LIVE renewing holder over its skewed stamp")
      // holder dies: renewals stop, the mtime ages, and the waiter heals
      // after ~one lease (the fallback aging bound for a stamp that
      // reads expires ≤ mtime) — failover still works
      val diedAt = System.currentTimeMillis()
      renewing.set(false)
      renewer.join()
      waiter.get(30, java.util.concurrent.TimeUnit.SECONDS)
      // ≥ lease − one renewal period: the last renewal can predate
      // diedAt by up to its 100 ms cadence
      assert(acquiredAt.get() >= diedAt + 850,
        s"healed ${acquiredAt.get() - diedAt} ms after death — before the " +
          "lease-aging bound: the heal is still trusting a clock stamp")
      assert(!lock.exists(), "the healed-and-reacquired lease must release")
    } finally { renewing.set(false); pool.shutdownNow() }
  }

  test("completion gate vs our own renewer's delete-to-rename gap: a transient clean absence with our token restored is NOT a heal-out (r18 ADVICE)") {
    val dir = java.nio.file.Files.createTempDirectory("lock_gateabs").toString
    val artifact = s"$dir/art"
    val lock = new java.io.File(BuildLock.lockPath(artifact).toUri.getPath)
    // leaseMs=60s: no real renewer tick fires during the test — the body
    // itself simulates the renewal's no-replace fallback window (lock
    // deleted, re-renamed ~50 ms later with OUR token) landing exactly
    // when the completion gate reads
    val r = BuildLock.withLease(spark, artifact, "gap-mutator",
      leaseMs = 60000, pollMs = 50, mutation = true) {
      val ours = java.nio.file.Files.readAllBytes(lock.toPath)
      assert(lock.delete())
      val restorer = new Thread(() => {
        Thread.sleep(50)
        val out = new java.io.FileOutputStream(lock)
        out.write(ours)
        out.close()
      })
      restorer.setDaemon(true)
      restorer.start()
      21L // gate reads: absent → confirm-delay → OUR token → trusted
    }
    assert(r == 21L,
      "the gate adjudicated our own renewal gap as a heal-out")
    assert(!lock.exists(), "lease not released")
  }

  test("completion gate: PERSISTENT absence, or absence resolving to a foreign token, still rejects the mutation (r18 ADVICE red controls)") {
    val dir = java.nio.file.Files.createTempDirectory("lock_gateabs2").toString
    val artifact = s"$dir/art"
    val lock = new java.io.File(BuildLock.lockPath(artifact).toUri.getPath)
    // repeated absence across the confirm delay = a healer really took it
    intercept[BuildLock.LeaseLostException] {
      BuildLock.withLease(spark, artifact, "healed-away-mutator",
        leaseMs = 60000, pollMs = 50, mutation = true) {
        assert(lock.delete())
        33L
      }
    }
    // absence resolving to a parseable FOREIGN token inside the confirm
    // delay = the healer's claim landed mid-gate; reject immediately
    intercept[BuildLock.LeaseLostException] {
      BuildLock.withLease(spark, artifact, "raced-away-mutator",
        leaseMs = 60000, pollMs = 50, mutation = true) {
        assert(lock.delete())
        val claimer = new Thread(() => {
          Thread.sleep(50)
          val out = new java.io.FileOutputStream(lock)
          out.write((s"token=new-holder-token\nholder=other:99\n" +
            s"expires=${System.currentTimeMillis() + 600000}").getBytes("UTF-8"))
          out.close()
        })
        claimer.setDaemon(true)
        claimer.start()
        34L
      }
    }
    // the foreign claim must survive our release untouched
    val content = new String(
      java.nio.file.Files.readAllBytes(lock.toPath), "UTF-8")
    assert(content.contains("token=new-holder-token"),
      s"release clobbered the new claim: $content")
    assert(lock.delete())
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

  test("gate-time ownership re-read: a heal-out the renewer never observed (tick interval > body wall) is still rejected at completion (r17 verdict #1)") {
    val dir = java.nio.file.Files.createTempDirectory("lock_gate").toString
    val artifact = s"$dir/art"
    val lock = new java.io.File(BuildLock.lockPath(artifact).toUri.getPath)
    val foreign = s"token=new-holder-token\nholder=other:99\n" +
      s"expires=${System.currentTimeMillis() + 600000}"
    val bodyFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    // leaseMs=60s → first renewer tick at 20s, far past the body's end:
    // the ONLY thing that can catch this heal-out is the completion
    // gate's own authoritative re-read (the resumed-holder-beats-the-
    // renewer-tick window the flag alone leaves open)
    val ex = intercept[BuildLock.LeaseLostException] {
      BuildLock.withLease(spark, artifact, "resumed-mutator",
        leaseMs = 60000, pollMs = 50, mutation = true) {
        val out = new java.io.FileOutputStream(lock)
        out.write(foreign.getBytes("UTF-8"))
        out.close()
        bodyFinished.set(true)
        42L
      }
    }
    assert(ex.getMessage.contains("healed out"))
    assert(bodyFinished.get())
    // release must have left the new holder's claim untouched
    val content = new String(
      java.nio.file.Files.readAllBytes(lock.toPath), "UTF-8")
    assert(content == foreign, s"gate path clobbered the new claim: $content")
    assert(lock.delete())
  }

  // ---- injected object-store semantics (FaultFs; r17 ADVICE medium +
  // verdict Next #6). The artifact lives under the faultfs:// scheme so
  // BuildLock's lock IO routes through the fault-injecting filesystem.
  private def faultArtifact(tag: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.faultfs.impl", classOf[FaultFs].getName)
    FaultFs.reset()
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    s"faultfs://$dir/art"
  }
  private def lockFile(artifact: String): java.io.File =
    new java.io.File(BuildLock.lockPath(artifact).toUri.getPath)

  test("a transient lock-read failure during renewal is NOT a heal-out: the mutation finishes and its result is trusted (r17 ADVICE, medium)") {
    val artifact = faultArtifact("lock_flaky")
    try {
      val r = BuildLock.withLease(spark, artifact, "flaky-store-mutator",
        leaseMs = 1200, pollMs = 50, mutation = true) {
        // the tick at ~400ms reads the lock through two injected IO
        // failures (ownership's read + its retry) — the pre-fix code
        // set healedOut on the first None and failed the whole batch
        FaultFs.failOpens.set(2)
        Thread.sleep(900)
        11L
      }
      assert(r == 11L, "a flaky read spuriously failed a healthy mutation")
      assert(!lockFile(artifact).exists(), "lease not released")
    } finally FaultFs.reset()
  }

  test("rename-won't-replace store (S3A-style): renewal takes the destination-exists delete+retry path and keeps the lease fresh (r17 verdict #6)") {
    val artifact = faultArtifact("lock_noreplace")
    try {
      FaultFs.renameNoReplace = true
      val claimedAt = System.currentTimeMillis()
      val expiresSeen = BuildLock.withLease(spark, artifact, "noreplace-mutator",
        leaseMs = 600, pollMs = 50, mutation = true) {
        Thread.sleep(1200) // ≥ 5 renewal ticks, every one through the fallback
        // read the renewed expiry (retry over the delete→retry gap)
        var e = 0L; var tries = 0
        while (e == 0L && tries < 50) {
          val txt = try new String(java.nio.file.Files.readAllBytes(
            lockFile(artifact).toPath), "UTF-8") catch { case _: Exception => "" }
          txt.split('\n').find(_.startsWith("expires=")) match {
            case Some(l) => e = l.stripPrefix("expires=").trim.toLong
            case None => tries += 1; Thread.sleep(20)
          }
        }
        e
      }
      // renewed well past the original claim's expiry — the fallback is
      // a real renewal, not a silent skip
      assert(expiresSeen > claimedAt + 900,
        s"lease not renewed through the no-replace fallback: expires=$expiresSeen claimed=$claimedAt")
      assert(FaultFs.refusedRenames.get() >= 1, "the no-replace branch never ran")
      assert(!lockFile(artifact).exists(), "lease not released")
    } finally FaultFs.reset()
  }

  test("claim-race abort: the delete+retry gap lost to a claimant → healed-out, and the mutation result is rejected (r17 verdict #6)") {
    val artifact = faultArtifact("lock_race")
    try {
      intercept[BuildLock.LeaseLostException] {
        BuildLock.withLease(spark, artifact, "raced-mutator",
          leaseMs = 1200, pollMs = 50, mutation = true) {
          // first rename fails (as on a no-replace store), ownership
          // re-read still ours → delete own lock → retry rename ALSO
          // fails = a claimant took the gap and owns the lease now
          FaultFs.failRenames.set(2)
          Thread.sleep(900)
          13L
        }
      }
      assert(FaultFs.failRenames.get() == 0, "the abort branch never ran")
    } finally FaultFs.reset()
  }

  test("a failed rename followed by an unreadable re-read SKIPS the renewal (never deletes a possibly-foreign lock, never flags); the next tick renews (r17 verdict #6)") {
    val artifact = faultArtifact("lock_skiprenew")
    try {
      val r = BuildLock.withLease(spark, artifact, "skip-renew-mutator",
        leaseMs = 1200, pollMs = 50, mutation = true) {
        // tick at ~400ms: pre-commit ownership read passes (skipOpens),
        // the rename fails, and the post-failure re-read hits two
        // injected IO failures → Unknown → abandon this renewal with
        // the lock file UNTOUCHED; the tick at ~800ms renews normally
        FaultFs.skipOpens.set(1)
        FaultFs.failRenames.set(1)
        FaultFs.failOpens.set(2)
        Thread.sleep(1500)
        assert(lockFile(artifact).exists(),
          "the skip path deleted the lock it could not read")
        17L
      }
      assert(r == 17L, "the skip path was escalated to a heal-out")
      assert(FaultFs.failRenames.get() == 0 && FaultFs.failOpens.get() == 0,
        "the injected fault sequence never ran")
      assert(!lockFile(artifact).exists(), "lease not released")
      // no renewal temp debris beside the lock
      val debris = lockFile(artifact).getParentFile.listFiles()
        .filter(_.getName.contains(".renew."))
      assert(debris.isEmpty, s"renewal temps leaked: ${debris.mkString(",")}")
    } finally FaultFs.reset()
  }
}
