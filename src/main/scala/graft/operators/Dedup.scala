package graft.operators

import graft.functions.TextFunctions
import graft.plans.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2
  * q20–q24). All of them are declarative DataFrame transforms: Catalyst
  * prunes the scans and AQE handles skew; nothing collects to the driver.
  *
  * Scale notes (100 TB):
  *  - [[exact]] shuffles a 32-byte digest + id, never the document text.
  *  - [[minHashPairs]] is linear in corpus size: LSH banding shuffles
  *    (band, bandHash) keys; only same-bucket candidates are joined. The
  *    all-pairs variant [[ngramJaccardPairs]] exists as the correctness
  *    baseline / small-side path.
  *  - [[simHashPairs]] blocks on 15-bit simhash chunks: hamming ≤ 3 over a
  *    60-bit fingerprint pigeonholes into ≥1 of the 4 chunks, so chunk
  *    equality is a lossless blocking key.
  */
object Dedup {

  /** Whitespace-collapsed, trimmed, lowercased text — the normalization the
    * exact-dedup key is computed over.
    */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Exact dedup on normalized text. Shuffles only a 64-bit `xxhash64` key
    * plus the id — never the document text — so the shuffle width is
    * constant regardless of document size (the 100 TB path). Returns
    * (id, n_copies) where id is the lowest id of each duplicate class.
    *
    * xxhash64 collisions across distinct 100 TB-scale corpora are possible
    * in principle; callers needing cryptographic certainty can re-verify
    * survivors with [[exactSurvivors]] (which carries the text) or a
    * sha2 digest second pass.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), xxhash64(normalized(col(textCol))).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** The surviving corpus after exact dedup: full rows of the canonical
    * (lowest-id) copy of each duplicate class — what a training-data
    * pipeline actually feeds downstream.
    */
  def exactSurvivors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(exact(docs, idCol, textCol).select(idCol), Seq(idCol), "left_semi")

  /** Shingled docs — the shared prefix of the shingle-based pipelines.
    * Shingle-less docs (shorter than n tokens) are dropped here: they have
    * no Jaccard evidence, and an empty set's MinHash signature is the
    * all-max constant — every such doc would collide in every LSH band.
    */
  private def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(
      col(idCol).as("id"),
      TextFunctions.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** MinHash + LSH near-duplicate pairs, exact-verified.
    *
    * shingle → 128-hash MinHash signature (native codegen'd expression) →
    * 32 bands × 4 rows → bucket self-join on (band, bandHash) → exact
    * Jaccard filter at `threshold`. Band parameters give miss probability
    * (1 - s^4)^32 ≈ 1e-15 at s = 0.9, so the verified output equals the
    * brute-force result for any realistically separated corpus.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minHashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.7,
      bands: Int = 32, rowsPerBand: Int = 4,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val sh = shingled(docs, idCol, textCol, n)

    // Banding consumes the signature; verification consumes only the
    // shingle sets — keep the 128-hash MinHash computation out of the
    // verify branch (it would otherwise be recomputed per verify join).
    val banded = sh
      .select(col("id"), HashFunctions.minHashSignature(col("sh")).as("sig"))
      .select(
        col("id"),
        explode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => struct(
              b.as("band"),
              xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))))
          .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    val candidates = cappedBucketPairs(banded, Seq("band", "bh"), bucketCap)
      .distinct()

    verifyPairs(candidates, sh, threshold)
  }

  /** Per-bucket candidate cap (SURVEY §5). A boilerplate-text bucket with B
    * members emits B²/2 candidate pairs; one hot bucket at corpus scale can
    * dwarf the rest of the job and AQE skew-split cannot help (the blowup is
    * in the join output, not the input partition). Capping keeps the
    * lowest-id `cap` members per bucket — a documented approximation: pairs
    * between two docs that BOTH fall outside the cap in EVERY shared bucket
    * are missed. With cap ≫ any legitimate near-dup cluster size, only
    * degenerate buckets are truncated.
    */
  val DefaultBucketCap = 1000

  /** Candidate pairs per bucket with ONE shuffle: window-cap the bucket
    * membership (row_number ≤ cap, lowest ids kept), then collect the
    * surviving ids per bucket — the groupBy reuses the window's hash
    * partitioning, so no second exchange — and expand the C(n,2) pairs
    * with array lambdas (no self-join, no double computation of the
    * upstream pipeline). `extraCols` ride along into the pair structs
    * (e.g. the simhash fingerprint, so verification needs no re-join).
    */
  private def cappedBucketPairs(
      banded: DataFrame, keys: Seq[String], cap: Int,
      extraCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("id"))
    val member = struct((col("id").as("id") +: extraCols.map(col)): _*)
    val buckets = banded
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(member)).as("ms"))
      .filter(size(col("ms")) > 1)
    buckets
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(
          slice(col("ms"), i + 2, size(col("ms"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a.id").as("id_a") +: col("p.b.id").as("id_b") +:
        extraCols.flatMap(c =>
          Seq(col(s"p.a.$c").as(s"${c}_a"), col(s"p.b.$c").as(s"${c}_b"))): _*)
  }

  /** EXACT n-gram Jaccard similarity self-join via an inverted-index
    * (PPJoin-style) equi-join — identical output to the all-pairs scan,
    * but linear-ish in total shingle occurrences instead of quadratic in
    * corpus size.
    *
    * Any pair with J ≥ t > 0 shares ≥1 shingle, so candidates are exactly
    * the pairs co-occurring under some shingle: explode (id, shingle),
    * equi-join on the shingle (a shuffle Catalyst can hash-partition),
    * count shared shingles per pair, and compute J from the counted
    * intersection + the two set sizes. A size-ratio prefilter
    * (t·|B| ≤ |A| ≤ |B|/t when J ≥ t) prunes candidates inside the join
    * without changing the result. Shingle arrays never ride the shuffle —
    * only (id, size, one shingle) rows do.
    *
    * Scale note: a stop-shingle (boilerplate n-gram) with document
    * frequency f contributes f²/2 candidate rows. That is inherent to any
    * EXACT algorithm; where approximation is acceptable, [[minHashPairs]]
    * with its hot-bucket cap is the scale path.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.7): DataFrame = {
    val d = shingled(docs, idCol, textCol, n).withColumn("sz", size(col("sh")))
    val inv = d.select(col("id"), col("sz"), explode(col("sh")).as("s"))
    inv.as("a")
      .join(inv.as("b"),
        col("a.s") === col("b.s")
          && col("a.id") < col("b.id")
          && col("b.sz") * threshold <= col("a.sz")
          && col("a.sz") * threshold <= col("b.sz"))
      .groupBy(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .select(
        col("id_a"), col("id_b"),
        round(col("inter").cast("double")
          / (col("sz_a") + col("sz_b") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact-verify candidate pairs against the shingle sets. */
  private def verifyPairs(candidates: DataFrame, d: DataFrame, threshold: Double): DataFrame =
    candidates
      .join(d.as("da"), col("id_a") === col("da.id"))
      .join(d.as("db"), col("id_b") === col("db.id"))
      .select(
        col("id_a"), col("id_b"),
        round(TextFunctions.jaccard(col("da.sh"), col("db.sh")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** SimHash near-duplicate pairs: 60-bit simhash fingerprints, blocked on
    * 4 × 15-bit chunks (lossless for maxHamming ≤ 3), hamming-verified.
    * Returns (id_a, id_b, hamming).
    */
  /** bucketCap here defaults to OFF (Int.MaxValue), unlike minhash: the
    * 4-chunk blocking is the EXACTNESS argument of this operator — every
    * hamming≤3 pair shares a chunk — and a cap silently drops true pairs
    * whenever a 15-bit chunk value runs hot, which structured fingerprints
    * do (common-word bit patterns concentrate; observed at sf0.1: cap 1000
    * lost 428 of 4731 pairs). Opt in to a cap only when a degenerate
    * corpus makes the quadratic bucket blowup worse than missing pairs.
    */
  def simHashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bucketCap: Int = Int.MaxValue): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking is only lossless for hamming <= 3")
    val t = docs.select(
      col(idCol).as("id"),
      HashFunctions.simHash64(TextFunctions.tokens(col(textCol))).as("sim"))

    val banded = t
      .select(col("id"), col("sim"),
        explode(array((0 to 3).map(c =>
          struct(
            lit(c).as("chunk"),
            (shiftrightunsigned(col("sim"), c * 15) % 32768).as("cv"))): _*)).as("x"))
      .select(col("id"), col("sim"), col("x.chunk").as("chunk"), col("x.cv").as("cv"))

    // The fingerprints ride into the pair expansion, so hamming needs no
    // join back to the corpus at all.
    cappedBucketPairs(banded, Seq("chunk", "cv"), bucketCap, extraCols = Seq("sim"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold), brute force
    * with the codegen'd [[graft.plans.CosineSimilarity]] kernel. The LSH
    * scale path is [[Knn.lshBuckets]]. Returns (id_a, id_b, cos).
    */
  def embeddingNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(graft.plans.VectorFunctions.cosineSimilarity(col("a.v"), col("b.v")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
