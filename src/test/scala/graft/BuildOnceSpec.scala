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
}
