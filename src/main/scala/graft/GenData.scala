package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf-shaped corpus generator for scale validation.
  *
  * The driver's test corpora stop at sf0.1 (5k documents / 2k embeddings)
  * and `/root/testdata` is read-only, so the 10× "does the candidate count
  * actually grow linearly" experiment needs its own data. This generator
  * reproduces the measured SHAPE of the driver corpus at any scale factor:
  *
  *   - documents: 50000×sf rows, 31-word vocabulary (the exact word list
  *     observed at sf0.1), uniform doc length 10..100 words, language mix
  *     ≈ 41% en / 15% zh / 15% es / 15% fr / 14% de, 20 sources, ~0.2%
  *     exact-duplicate docs and ~0.3% near-duplicates (a copy with ~5% of
  *     positions re-rolled) — the structure the dedup family feeds on.
  *   - embeddings: 20000×sf rows, 64-dim unit-norm vectors (hash-seeded
  *     Box–Muller gaussians — the same near-uniform directional spread as
  *     the driver data), 10 labels.
  *
  * Everything derives from `xxhash64(tag, id, …)` column math: the output
  * is a pure function of the row id, reproducible under any partitioning
  * or parallelism (the q35 idHash discipline), with no driver-side RNG
  * state. Usage:
  *
  *   runMain graft.GenData <outDir> <sf>      e.g.  gen/sf1 1.0
  */
object GenData {

  /** The 31-word vocabulary of the driver corpus (extracted from sf0.1). */
  val vocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  private def vocabArr: Column = array(vocab.map(lit): _*)

  /** Pick a word from a hash of (tag, id, position).
    *
    * `vocabSize <= 31` draws uniformly from the driver word list (the
    * measured sf0.1 distribution). Larger sizes synthesize a ZIPF-ish
    * vocabulary `w1..w<V>` via inverse-CDF on the uniform hash draw: for
    * Zipf exponent 1, CDF(r) ≈ ln r / ln V, so rank = floor(V^u) — rank 1
    * is drawn ~V/ln V times more often than rank V, the head/tail shape of
    * real text. The 31-word corpus is the dedup family's DEGENERATE regime
    * (no rare terms — prefix filters can't discriminate); the Zipf corpus
    * is the realistic one. Measuring both brackets the operators.
    */
  private def word(tag: String, id: Column, pos: Column, vocabSize: Int): Column =
    if (vocabSize <= vocab.size)
      element_at(
        vocabArr,
        (pmod(xxhash64(lit(tag), id, pos), lit(vocab.size.toLong)) + 1).cast("int"))
    else {
      val u = (pmod(xxhash64(lit(tag), id, pos), lit(1000000L)).cast("double") + 0.5) / 1000000.0
      concat(lit("w"), least(
        floor(pow(lit(vocabSize.toDouble), u)), lit(vocabSize.toDouble)).cast("long"))
    }

  /** Fresh word array for one id: uniform length minWords..maxWords, iid
    * words. The 10..100 default mirrors the driver corpus; the fingerprint
    * family's decade corpora (r11) use 250..500 so the derived containers
    * are big enough for FULL-RANK fingerprints — an image under ~1536
    * bytes decodes to fewer than 8 pixel rows, which leaves whole dHash
    * grid rows empty (their 7 bits forced zero) and collapses the hash
    * space into dense accidental Hamming balls. Short-doc corpora are the
    * degenerate regime (measured separately — the hot-bucket guard's
    * domain); long-doc corpora are the realistic one.
    */
  private def freshWords(
      id: Column, vocabSize: Int, minWords: Int, maxWords: Int): Column = {
    val len = (lit(minWords) + pmod(xxhash64(lit("len"), id),
      lit((maxWords - minWords + 1).toLong)).cast("int"))
    transform(sequence(lit(0), len - 1), p => word("w", id, p, vocabSize))
  }

  def documents(spark: SparkSession, nDocs: Long, vocabSize: Int = 31,
      minWords: Int = 10, maxWords: Int = 100): DataFrame = {
    val base = spark.range(nDocs).toDF("doc_id")
      .withColumn("words", freshWords(col("doc_id"), vocabSize, minWords, maxWords))

    // Duplicate structure: per-mille draw decides fresh / exact copy /
    // perturbed copy / MEDIA-only copy; copy targets reach back ≤97 ids so
    // base text arrives via a self-join on doc ids, never a driver loop.
    // The "media" kind (r11, for the fingerprint family's decade rows) is
    // the q47d plant shape at scale: every word ≥4 chars has its
    // characters sorted in place, so the copy shares ZERO word shingles
    // with its base (text dedup is blind) while the deterministic
    // containers' coarse luma/envelope barely move (image/audio Hamming
    // ~0) — the planted rate the cross-modal operators must recover.
    val roll = pmod(xxhash64(lit("dup"), col("doc_id")), lit(1000L))
    val tagged = base
      .withColumn("kind",
        when(col("doc_id") < 100, lit("fresh"))
          .when(roll < 2, lit("exact"))
          .when(roll < 5, lit("near"))
          .when(roll < 8, lit("media"))
          .otherwise(lit("fresh")))
      .withColumn("base_id",
        when(col("kind") =!= "fresh",
          col("doc_id") - 1 - pmod(xxhash64(lit("back"), col("doc_id")), lit(97L))))

    // broadcast the ~0.8%-of-corpus copy-spec side EXPLICITLY: both sides
    // derive from range() whose post-filter stats Spark can't estimate,
    // and at sf10 it picked the full 500k-doc words side for the
    // broadcast — a >1 GB driver collect (maxResultSize abort)
    val copies = broadcast(tagged.filter(col("kind") =!= "fresh")
      .select(col("doc_id"), col("kind"), col("base_id")))
      .join(base.select(col("doc_id").as("base_id"), col("words").as("bwords")), "base_id")
      .withColumn("words",
        when(col("kind") === "exact", col("bwords"))
          .when(col("kind") === "media",
            // media-only dup: sort each long word's chars in place (zero
            // shared shingles, near-zero container distance). split on ""
            // yields one element per char in Spark; filter guards the
            // empty tail element some regex engines append
            transform(col("bwords"), w =>
              when(length(w) <= 3, w).otherwise(
                array_join(array_sort(filter(split(w, ""), c => c =!= "")), ""))))
          .otherwise(
            // near-dup: re-roll ~1/20 of positions of the base words
            transform(col("bwords"), (w, i) =>
              when(pmod(xxhash64(lit("p"), col("doc_id"), i), lit(20L)) === 0,
                word("pw", col("doc_id"), i, vocabSize)).otherwise(w))))
      .select(col("doc_id"), col("words"))

    val words = tagged.filter(col("kind") === "fresh").select(col("doc_id"), col("words"))
      .unionByName(copies)

    val lang = pmod(xxhash64(lit("lang"), col("doc_id")), lit(100L))
    words
      .withColumn("text", array_join(col("words"), " "))
      .select(
        col("doc_id"),
        col("text"),
        when(lang < 41, "en").when(lang < 56, "zh").when(lang < 71, "es")
          .when(lang < 86, "fr").otherwise("de").as("lang"),
        concat(lit("src"), pmod(col("doc_id"), lit(20L))).as("source"),
        length(col("text")).as("n_chars"))
  }

  /** Hash-seeded standard gaussian: Box–Muller over two uniform draws in
    * (0,1) derived from (tag, id, dim). */
  private def gauss(tag: String, id: Column, d: Column): Column = {
    val u1 = (pmod(xxhash64(lit(tag + "1"), id, d), lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val u2 = (pmod(xxhash64(lit(tag + "2"), id, d), lit(1000000L)).cast("double") + 0.5) / 1000000.0
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  def embeddings(spark: SparkSession, nVecs: Long, dim: Int = 64): DataFrame = {
    val raw = spark.range(nVecs).toDF("vec_id")
      .withColumn("g", transform(sequence(lit(0), lit(dim - 1)),
        d => gauss("g", col("vec_id"), d)))
    val norm = sqrt(aggregate(col("g"), lit(0.0), (acc, x) => acc + x * x))
    raw
      .select(
        col("vec_id"),
        transform(col("g"), x => (x / norm).cast("float")).as("embedding"),
        pmod(xxhash64(lit("lab"), col("vec_id")), lit(10L)).cast("int").as("label"))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sf = args(1).toDouble
    val vocabSize = if (args.length > 2) args(2).toInt else vocab.size
    val minWords = if (args.length > 3) args(3).toInt else 10
    val maxWords = if (args.length > 4) args(4).toInt else 100
    val nDocs = math.round(50000 * sf)
    val nVecs = math.round(20000 * sf)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    documents(spark, nDocs, vocabSize, minWords, maxWords)
      .repartition(math.max(4, (sf * 16).toInt))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, nVecs)
      .repartition(math.max(4, (sf * 16).toInt))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[gendata] wrote $nDocs docs / $nVecs vecs to $outDir")
    spark.stop()
  }
}
