package graft

import graft.operators.Pq
import graft.sources.{BuildLock, Compaction}
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): CRASH-INJECTION lifecycle fuzz (r17
  * verdict Next #3) — [[ProbeMutatorFuzz2Jvm]]'s randomized two-producer
  * schedule (mb-/day- appendBatch × rebuildIfDrifted × compact on ONE
  * artifact, two real JVMs), plus a seeded `destroyForcibly()` (SIGKILL)
  * of one child MID-MUTATION. The survivor keeps running its schedule
  * (healing the dead holder's lease after expiry — the mutators run with
  * a 5 s `leaseMs` so takeover happens inside the test budget, the knob
  * deployments tune for exactly this failover), and the killed child is
  * RESTARTED with the same seed: its applied batches replay-no-op, its
  * killed-in-flight op heals through whichever crash window the kill
  * landed in (`.pre` manifest self-heal, claimed-but-dead marker,
  * staged-rebuild discard, expired-lease heal) and re-applies. These
  * heal paths are spec'd individually; this is the first time a REAL
  * process death exercises them under a randomized schedule.
  *
  * Invariants (parent, after survivor + restarted child both exit 0):
  *   - final index ids = EXACTLY the union of the 10 batches (1000 rows,
  *     1000 distinct — the killed batch is never lost OR double-applied);
  *   - all 10 markers present under their producer namespaces, non-empty;
  *   - no orphan `.build.lock`, `.renew.` temp, `.pre` manifest,
  *     `.rebuild.staged` dir, or `_swap_ready` sentinel;
  *   - the artifact rehydrates and probes.
  *
  *   tools/runjava.sh -cp target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/'*' \
  *     graft.ProbeCrashFuzz2Jvm [seed]
  */
object ProbeCrashFuzz2Jvm {

  private val Nlist = 8
  private val M = 4
  private val K = 8
  private val LeaseMs = 5000L

  private def log(file: String, event: String): Unit = {
    val line = s"ts=${System.currentTimeMillis()} $event\n"
    val out = new java.io.FileOutputStream(file, true)
    try out.write(line.getBytes("UTF-8")) finally out.close()
  }

  /** Child mode: one producer running its seeded schedule. Identical to
    * ProbeMutatorFuzz2Jvm's child except (a) every mutator runs with the
    * short crash-failover lease, and (b) each op logs `begin …` BEFORE
    * it starts — the parent's kill trigger, and the record of which op
    * the SIGKILL interrupted.
    */
  private def child(args: Array[String]): Unit = {
    val Array(dataDir, idxPath, logFile, goFile, childIdx, seedStr) = args
    val ci = childIdx.toInt
    val seed = seedStr.toLong
    val ns = if (ci == 0) "mb" else "day"
    val idBase = if (ci == 0) 0L else 1000L
    val batchIds = if (ci == 0) (101L to 105L) else (201L to 205L)

    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(dataDir).localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def indexExists(): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$idxPath/_centroids/_SUCCESS"))

    sealed trait Op
    case class Append(batchId: Long, lo: Long, hi: Long) extends Op
    case object Rebuild extends Op
    case object Compact extends Op
    val appends = batchIds.zipWithIndex.map { case (b, i) =>
      Append(b, idBase + i * 100L, idBase + (i + 1) * 100L)
    }
    val rnd = new scala.util.Random(seed * 31 + ci)
    val ops = rnd.shuffle((appends ++ Seq(Rebuild, Rebuild, Compact, Compact)).toList)
    log(logFile, s"schedule ${ops.map {
      case Append(b, _, _) => s"$ns-$b"
      case Rebuild => "rebuild"
      case Compact => "compact"
    }.mkString(",")}")

    log(logFile, "ready")
    while (!new java.io.File(goFile).exists()) Thread.sleep(20)

    def withRetry[T](what: String)(body: => T): T = {
      var left = 5
      while (true) {
        try return body
        catch { case e: BuildLock.LeaseLostException =>
          left -= 1
          log(logFile, s"$what lease-lost retry (left=$left)")
          if (left == 0) throw e
        }
      }
      sys.error("unreachable")
    }

    ops.foreach {
      case Append(b, lo, hi) =>
        log(logFile, s"begin append $ns-$b")
        val batch = corpus.filter(col("vec_id") >= lo && col("vec_id") < hi)
        val n = withRetry(s"append $ns-$b") {
          Pq.appendBatch(spark, batch, "vec_id", "embedding", idxPath, b,
            nlist = Nlist, m = M, k = K, namespace = ns, leaseMs = LeaseMs)
        }
        log(logFile, s"append $ns-$b applied=$n")
      case Rebuild =>
        if (!indexExists()) log(logFile, "rebuild skipped (no index yet)")
        else {
          log(logFile, "begin rebuild")
          def union = corpus.join(
            spark.read.parquet(idxPath).select(col("id").as("vec_id")),
            Seq("vec_id"), "left_semi")
          val did = withRetry("rebuild") {
            Pq.rebuildIfDrifted(spark, idxPath, union, "vec_id", "embedding",
              nlist = Nlist, m = M, k = K,
              maxSkewGrowth = 1.25, maxGrowth = 1.25, leaseMs = LeaseMs)
          }
          log(logFile, s"rebuild fired=$did")
        }
      case Compact =>
        if (!indexExists()) log(logFile, "compact skipped (no index yet)")
        else {
          log(logFile, "begin compact")
          val done = withRetry("compact") {
            Compaction.compact(spark, idxPath, "cell",
              maxFiles = 1, smallFileBytes = Long.MaxValue / 4,
              leaseMs = LeaseMs)
          }
          log(logFile, s"compact partitions=${done.size}")
        }
    }
    log(logFile, "done")
    spark.stop()
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
    "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(m => Seq("--add-opens", s"$m=ALL-UNNAMED"))

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("child")) return child(args.drop(1))
    val seed = args.headOption.map(_.toLong).getOrElse(1L)
    val rnd = new scala.util.Random(seed * 7919 + 13)
    val victim = rnd.nextInt(2)          // which child dies
    val killAfterBegins = 2 + rnd.nextInt(4) // SIGKILL inside its Nth op
    val killDelayMs = rnd.nextInt(400)   // land at a random depth of the op

    val scratch = java.nio.file.Files.createTempDirectory("crashfuzz").toString
    val dataDir = s"$scratch/emb"
    val idxPath = s"$scratch/idx"
    val goFile = s"$scratch/go"

    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ids = (0L until 500L) ++ (1000L until 1500L)
    ids.map { i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding").coalesce(1).write.parquet(dataDir)

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path").split(':')
      .map(e => new java.io.File(e).getAbsolutePath).mkString(":")
    def fork(i: Int, attempt: String): (Process, String) = {
      val logFile = s"$scratch/child$i$attempt.log"
      val cwd = new java.io.File(s"$scratch/cwd$i$attempt")
      cwd.mkdirs()
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-Xmx3g", "-cp", cp, "graft.ProbeCrashFuzz2Jvm", "child",
        dataDir, idxPath, logFile, goFile, i.toString, seed.toString))
      val pb = new ProcessBuilder(cmd: _*).directory(cwd)
      pb.redirectOutput(new java.io.File(s"$scratch/child$i$attempt.out"))
      pb.redirectErrorStream(true)
      (pb.start(), logFile)
    }
    var children = Seq(fork(0, "a"), fork(1, "a"))

    def lines(f: String): Seq[String] =
      if (!new java.io.File(f).exists()) Seq.empty
      else scala.io.Source.fromFile(f).getLines().toSeq
    val deadline = System.currentTimeMillis() + 120000
    while (!children.forall { case (_, f) => lines(f).exists(_.endsWith("ready")) }) {
      require(System.currentTimeMillis() < deadline, "children never became ready")
      require(children.forall(_._1.isAlive), "a child died before ready — " +
        s"see $scratch/child*.out")
      Thread.sleep(50)
    }
    new java.io.FileOutputStream(goFile).close()

    // the kill: wait until the victim has BEGUN its Nth op, let it get a
    // seeded-random distance in, then SIGKILL — mid-mutation by
    // construction (each op spans Spark jobs; "begin" precedes the body)
    val (vProc, vLog) = children(victim)
    val killDeadline = System.currentTimeMillis() + 300000
    var killed = false
    while (!killed && vProc.isAlive) {
      require(System.currentTimeMillis() < killDeadline,
        s"victim never reached begin #$killAfterBegins; see $vLog")
      val begins = lines(vLog).count(_.contains(" begin "))
      if (begins >= killAfterBegins) {
        Thread.sleep(killDelayMs)
        vProc.destroyForcibly()
        vProc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
        killed = true
        val interrupted = lines(vLog).reverse.find(_.contains(" begin "))
          .map(_.split(" begin ").last).getOrElse("?")
        log(vLog, s"PARENT killed child $victim (SIGKILL) after " +
          s"$killAfterBegins begins +${killDelayMs}ms, mid <$interrupted>")
      } else Thread.sleep(25)
    }
    require(killed, s"victim finished its whole schedule before the kill " +
      s"point (begin #$killAfterBegins) — schedule too fast; see $vLog")

    // restart the killed producer: same seed → same schedule. Applied
    // batches replay-no-op; the interrupted op heals and re-applies.
    val restarted = fork(victim, "b")
    children = children.updated(victim, restarted)

    children.foreach { case (p, _) =>
      require(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
        s"child did not finish; see $scratch")
      require(p.exitValue() == 0, s"child failed; see $scratch/child*.out " +
        s"and $scratch/child*.log")
    }

    val allLogs = Seq(s"$scratch/child0a.log", s"$scratch/child1a.log",
      s"$scratch/child${victim}b.log")
    val all = allLogs.flatMap(f => lines(f).map(l => (f.split('/').last, l)))
    all.sortBy(l => l._2.stripPrefix("ts=").takeWhile(_.isDigit).toLong)
      .foreach { case (who, l) => println(s"CRASHFUZZ seed=$seed $who $l") }

    // 1. exact id multiset: union of the 10 batches, each id ONCE
    val got = spark.read.parquet(idxPath).select(col("id"))
      .as[Long].collect().sorted
    assert(got.length == 1000, s"expected 1000 rows, got ${got.length}")
    assert(got.toSet == ids.toSet, "id SET diverged from the union of batches")
    assert(got.distinct.length == 1000, "duplicate ids — a double-applied batch")

    // 2. every batch marker present under its producer namespace, non-empty
    val batches = new java.io.File(s"$idxPath/_batches")
    val markers = batches.listFiles().filter(f =>
      graft.streaming.Markers.isBatchMarker(f.getName)).map(_.getName).toSet
    val expected = ((101L to 105L).map(b => s"mb-$b") ++
      (201L to 205L).map(b => s"day-$b")).toSet
    assert(markers == expected, s"marker inventory diverged: $markers")
    expected.foreach { name =>
      assert(new java.io.File(batches, name).length() > 0,
        s"marker $name is empty (claimed-but-dead)")
    }

    // 3. no orphan coordination debris — the SIGKILL's half-finished
    // mutation must leave nothing behind once the heals ran
    val root = new java.io.File(scratch)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk) :+ f
      else Seq(f)
    val debris = walk(root).filter { f =>
      val n = f.getName
      n.endsWith(".build.lock") || n.contains(".renew.") ||
        n.endsWith(".pre") || n.endsWith(".rebuild.staged") ||
        n == "_swap_ready"
    }
    assert(debris.isEmpty, s"orphan coordination debris: ${debris.mkString(",")}")

    // 4. the artifact rehydrates and probes
    val idx = Pq.readIndex(spark, idxPath)
    val emb = spark.read.parquet(dataDir)
    val q = emb.filter(col("vec_id") < 5)
    val probe = Pq.ivfTopKIndexed(idx, emb, q, "vec_id", "embedding", 3,
      nprobe = 4, refine = 30).collect()
    assert(probe.length == 15, s"probe returned ${probe.length} rows, want 15")

    println(s"CRASHFUZZ RESULT seed=$seed victim=$victim " +
      s"killAfter=$killAfterBegins+${killDelayMs}ms ids=1000/1000 " +
      s"markers=10/10 debris=0 probe-rows=${probe.length} " +
      s"cells=${idx.centroids.length}")
    spark.stop()
  }
}
