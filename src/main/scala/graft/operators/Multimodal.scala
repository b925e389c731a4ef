package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** A multimodal record: opaque media payload + typed metadata. At 100 TB
  * the payload column stays `binary` end to end — it is never parsed by
  * Catalyst, only by the batched decode step — and partitioning/pruning
  * happen on the scalar metadata columns.
  */
case class MediaRecord(doc_id: Long, fmt: String, payload: Array[Byte])

/** Decoded media metadata (the output of the decode/feature-extract step). */
case class MediaMeta(doc_id: Long, fmt: String, n_bytes: Long, width: Int, height: Int)

/** Decoded audio metadata: PCM parameters + duration from the real chunks. */
case class AudioMeta(doc_id: Long, fmt: String, n_bytes: Long, sample_rate: Int,
    channels: Int, bits: Int, n_samples: Long, duration_ms: Long)

/** Decoded video metadata from the real ISO-BMFF box tree: movie timescale
  * and duration out of `mvhd`, track count from the `trak` children, frame
  * count summed from each track's `stsz`, plus the stride-sampled frame
  * count (the frame-sample step a vision pipeline feeds its encoder).
  */
case class VideoMeta(doc_id: Long, fmt: String, n_bytes: Long, timescale: Int,
    duration_units: Long, duration_ms: Long, n_tracks: Int, n_frames: Long,
    n_frames_sampled: Long)

/** Multimodal column handling (SURVEY §2 q40).
  *
  * The payloads are REAL image containers — binary P6 PPM (Netpbm) and
  * 24-bpp uncompressed BMP (BITMAPINFOHEADER) — and [[decode]] is a
  * genuine decoder: it sniffs the magic bytes and reads dimensions out of
  * the actual headers (ASCII fields for PPM, little-endian int32 at
  * offsets 18/22 for BMP). No imaging library is involved because neither
  * format needs one: both are pure header math over the byte array, which
  * is exactly what makes them testable in this sandbox while exercising
  * the same plumbing — binary-payload schema, typed `Dataset` boundary,
  * batched `mapPartitions` decode (decoders want batches, not single
  * frames) — that a JPEG/PNG decoder would slot into.
  */
object Multimodal {

  /** How many records each decode call receives. Real decoders amortize
    * model/library setup per batch; header parsing keeps the same call
    * shape so swapping in a heavier codec changes no plumbing.
    */
  val DecodeBatchSize = 64

  /** Deterministic raster geometry for wrapping an n-byte blob as RGB
    * pixels: width varies with the payload so the decode is discriminating,
    * height covers the blob (zero-padded to 3·w·h bytes).
    */
  def rasterDims(n: Long): (Int, Int) = {
    val w = (16L + n % 49L).toInt
    val h = math.max(1L, (n + 3L * w - 1L) / (3L * w)).toInt
    (w, h)
  }

  /** Binary PPM (P6): `P6\n<w> <h>\n255\n` + 3·w·h RGB bytes. */
  def encodePpm(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, math.min(pixels.length, 3 * w * h))
    out
  }

  /** 24-bpp uncompressed BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER, rows padded to 4-byte boundaries.
    */
  def encodeBmp(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val size = 54 + rowSize * h
    val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = 0
    while (row < h) {
      val n = math.max(0, math.min(3 * w, pixels.length - row * 3 * w))
      if (n > 0) buf.put(pixels, row * 3 * w, n)
      buf.position(54 + (row + 1) * rowSize)
      row += 1
    }
    buf.array()
  }

  /** Genuine decode: sniff the magic, parse the real header. The reported
    * format comes from the BYTES, not the `fmt` column — a mislabeled
    * payload surfaces as a fmt mismatch instead of silently propagating.
    */
  def decode(batch: Seq[MediaRecord]): Seq[MediaMeta] =
    batch.map { r =>
      val p = r.payload
      if (p.length >= 2 && p(0) == 'P' && p(1) == '6') {
        // P6, then whitespace-separated ASCII width / height / maxval
        var i = 2
        def skipWs(): Unit = { while (i < p.length && p(i).toChar.isWhitespace) i += 1 }
        def int(): Int = {
          skipWs(); var v = 0
          while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
          v
        }
        val w = int(); val h = int()
        // a real header yields positive dims and a payload that covers
        // the raster; "P6" + garbage must reject, not decode as 0×0
        if (w <= 0 || h <= 0 || p.length - i < 3L * w * h)
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: malformed PPM header (w=$w h=$h, ${p.length} bytes)")
        MediaMeta(r.doc_id, "ppm", p.length.toLong, w, h)
      } else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') {
        val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val w = buf.getInt(18)
        val h = math.abs(buf.getInt(22)) // negative height = top-down rows
        if (w <= 0 || h == 0)
          throw new IllegalArgumentException(
            s"doc ${r.doc_id}: malformed BMP header (w=$w h=$h)")
        MediaMeta(r.doc_id, "bmp", p.length.toLong, w, h)
      } else throw new IllegalArgumentException(
        s"doc ${r.doc_id}: unrecognized media payload (${p.length} bytes)")
    }

  /** Wrap a text corpus as media records: the utf-8 bytes become the RGB
    * payload of a real PPM (even ids) or BMP (odd ids) container. In
    * production the payload would come from a binary-file source
    * (`spark.read.format("binaryFile")` or parquet with a binary column);
    * the downstream plumbing is identical.
    */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      // a null payload has nothing to wrap or decode: the doc drops here,
      // like the explode-based text operators (repetition, tfidf)
      .filter(col("text").isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val (w, h) = rasterDims(bytes.length.toLong)
        if (id % 2 == 0) MediaRecord(id, "ppm", encodePpm(bytes, w, h))
        else MediaRecord(id, "bmp", encodeBmp(bytes, w, h))
      }
  }

  /** q40: batched metadata extraction over the opaque payload column.
    * `mapPartitions` + `grouped(DecodeBatchSize)` gives each decode call a
    * batch while streaming the partition (no full-partition materialize).
    */
  def extractMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decode(batch))
    }
  }

  /** End-to-end q40 entry: documents → media records → batched decode →
    * typed metadata DataFrame.
    */
  def metaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    extractMeta(asMedia(docs)).toDF()

  // ----------------------------------------------------- perceptual hash

  /** Decode a media payload to its raw RGB raster (w, h, 3·w·h unsigned
    * bytes) — the pixel-level sibling of [[decode]]'s header-only walk,
    * feeding the perceptual fingerprint. PPM: the bytes after the header
    * verbatim. BMP: rows copied in STORED order with the 4-byte row
    * padding stripped (our synthetic encoder writes rows top-down; a
    * bottom-up real-world BMP fingerprints vertically flipped — consistent
    * per container, and a flip-invariant dedup would hash both
    * orientations). Byte order within a pixel (RGB vs BGR) is irrelevant
    * downstream: the fingerprint's luma is the order-invariant byte sum.
    */
  def rasterOf(r: MediaRecord): (Int, Int, Array[Byte]) = {
    val p = r.payload
    if (p.length >= 2 && p(0) == 'P' && p(1) == '6') {
      var i = 2
      def skipWs(): Unit = { while (i < p.length && p(i).toChar.isWhitespace) i += 1 }
      def int(): Int = {
        skipWs(); var v = 0
        while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
        v
      }
      val w = int(); val h = int(); int() // maxval
      i += 1 // the single whitespace after maxval (PPM spec)
      if (w <= 0 || h <= 0 || p.length - i < 3L * w * h)
        throw new IllegalArgumentException(
          s"doc ${r.doc_id}: malformed PPM raster (w=$w h=$h, ${p.length} bytes)")
      (w, h, java.util.Arrays.copyOfRange(p, i, i + 3 * w * h))
    } else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') {
      val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = buf.getInt(18)
      val h = math.abs(buf.getInt(22))
      val rowSize = ((3 * w + 3) / 4) * 4
      if (w <= 0 || h == 0 || 54L + rowSize.toLong * h > p.length)
        throw new IllegalArgumentException(
          s"doc ${r.doc_id}: malformed BMP raster (w=$w h=$h, ${p.length} bytes)")
      val out = new Array[Byte](3 * w * h)
      var row = 0
      while (row < h) {
        System.arraycopy(p, 54 + row * rowSize, out, row * 3 * w, 3 * w)
        row += 1
      }
      (w, h, out)
    } else throw new IllegalArgumentException(
      s"doc ${r.doc_id}: unrecognized media payload (${p.length} bytes)")
  }

  /** 56-bit perceptual GRADIENT hash (dHash, Krawetz) over the decoded
    * raster, all-integer so any engine reproduces it bit-for-bit: the
    * image downsamples to an 8×8 grid of cell luma averages (cell (r,c)
    * owns pixels with row·8 div h = r, col·8 div w = c; luma = the plain
    * R+G+B byte sum — BT.601 weights would drag float rounding into a
    * fingerprint), and bit r·7+c compares horizontal neighbors
    * avg(r,c) > avg(r,c+1) via cross-multiplication (sum_a·cnt_b >
    * sum_b·cnt_a — no division, no ties-by-rounding). 8 rows × 7
    * comparisons = 56 bits, deliberately < 60 so the value is sign-safe
    * as a BIGINT in both engines (the q22 discipline). Images shorter
    * than 8 pixel rows leave trailing grid rows empty (cnt 0 — both
    * comparisons false, deterministic on both sides).
    */
  def perceptualHash(w: Int, h: Int, raster: Array[Byte]): Long = {
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    val n = w * h
    var k = 0
    while (k < n) {
      val luma = (raster(3 * k) & 0xff) + (raster(3 * k + 1) & 0xff) +
        (raster(3 * k + 2) & 0xff)
      val ci = ((k / w) * 8 / h) * 8 + (k % w) * 8 / w
      sums(ci) += luma
      cnts(ci) += 1
      k += 1
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        val i = r * 8 + c
        if (sums(i) * cnts(i + 1) > sums(i + 1) * cnts(i)) bits |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** (doc_id, phash) for every document's image payload — the same
    * batched-decode shape as [[extractMeta]], decoding the REAL container
    * ([[rasterOf]]) before hashing.
    */
  def imagePhash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // full raster decode is the heavy kernel — spread a narrow input
    // (opt guide §2.5); the cheap header-walk meta paths stay unspread
    asMedia(Spread.ifNarrow(docs.select(col("doc_id"), col("text")))).mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val (w, h, px) = rasterOf(r)
        (r.doc_id, perceptualHash(w, h, px))
      })
    }.toDF("doc_id", "ph")
  }

  /** Perceptual NEAR-DUP image pairs (SURVEY §2 q117) — the multimodal
    * dedup stage the text families (q20–q23) don't reach: re-encoded,
    * re-contained or lightly-edited copies of an image share a close
    * dHash even when their bytes (and exact-dedup digests) differ
    * entirely. Returns (id_a, id_b, hamming ≤ maxHamming), id_a < id_b.
    *
    * Blocking is [[Dedup.simHashPairs]]' chunk-pair covering design on
    * 7 chunks of 8 bits: hamming ≤ h flips bits in ≤ h chunks, so
    * ≥ 7−h chunks agree exactly, and the key set per doc is a covering
    * graph whose independence number forces any (7−h)-subset to contain
    * a keyed pair — lossless, no candidate is ever dropped:
    *  - h ≤ 2 → ≥ 5 agree; matching {01,23,45} (independence 4): 3 keys.
    *  - h = 3 → ≥ 4 agree; triangles {012},{345} (independence 3): 6.
    *  - h = 4 → ≥ 3 agree; cliques {012} ∪ {3456} (independence 2): 9.
    *  - h = 5 → ≥ 2 agree; all C(7,2) = 21 pairs.
    * Pairs stream from a sort-merge self-join (spillable match groups,
    * ReusedExchange on the two identical sides) — never a per-bucket
    * collect. The fingerprint scan itself is one corpus pass; only
    * (id, 8-byte hash, key) rows shuffle, never pixels.
    */
  def imagePhashPairs(
      docs: DataFrame, maxHamming: Int = 4, bucketCap: Int = 0): DataFrame =
    hammingPairs56(imagePhash(docs), maxHamming, bucketCap)

  /** The chunk-pair list covering Hamming ≤ `maxHamming` over 7 8-bit
    * chunks (see [[imagePhashPairs]]'s covering-graph proof), in
    * ascending pairIdx order — the canonical-key rule below relies on
    * the ordering only through `least`, not positionally.
    */
  private def chunkPairs(maxHamming: Int): Seq[(Int, Int)] =
    if (maxHamming <= 2) Seq((0, 1), (2, 3), (4, 5))
    else if (maxHamming == 3) Seq((0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5))
    else if (maxHamming == 4)
      Seq((0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (3, 6), (4, 5), (4, 6), (5, 6))
    else for { i <- 0 until 7; j <- (i + 1) until 7 } yield (i, j)

  /** Blocking keys of a (doc_id, ph) fingerprint table: one row per
    * (doc, chunk pair), bk packed as (pairIdx << 16) | cv_i << 8 | cv_j.
    * Public because the STREAMING twin persists exactly these rows as its
    * fingerprint index and probes it with the same key expression.
    */
  def bandKeys56(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 5, "7-chunk pair blocking is only lossless for hamming <= 5")
    hashes.select(col("doc_id").as("id"), col("ph"),
      explode(array(bkExprs(col("ph"), maxHamming): _*)).as("bk"))
  }

  /** The blocking-key expressions for one 56-bit fingerprint column —
    * shared by [[bandKeys56]] and the multi-signal single-pass banding
    * ([[hammingPairs56Tagged]]).
    */
  private def bkExprs(ph: Column, maxHamming: Int): Seq[Column] = {
    def chunk(c: Int): Column = shiftrightunsigned(ph, c * 8) % 256
    chunkPairs(maxHamming).map { case (i, j) =>
      lit((i * 7 + j).toLong << 16) + chunk(i) * 256 + chunk(j)
    }
  }

  /** The canonical-key rule (q53's intersection-first-bin discipline):
    * a pair within the Hamming ball shares one blocking key per chunk
    * pair on which BOTH hashes agree — emitting at every shared key is
    * why the r10 implementation needed a `distinct()` (a full re-exchange
    * of the pair stream). Instead, each side of a match carries its bk,
    * and the pair is kept only where bk's pairIdx equals the SMALLEST
    * pairIdx the two hashes share — computable post-join from the XOR
    * alone, so duplicate emissions die in the join filter and the pair
    * stream needs no downstream dedup. `least` skips the null branches
    * (non-agreeing chunk pairs); the covering guarantees at least one
    * shared key whenever hamming ≤ maxHamming, so the minimum exists for
    * every reportable pair.
    */
  private def canonicalBk(
      phA: Column, phB: Column, bk: Column, maxHamming: Int): Column = {
    val x = phA.bitwiseXOR(phB)
    def agree(c: Int): Column = (shiftrightunsigned(x, c * 8) % 256) === 0
    val minShared = least(chunkPairs(maxHamming).map { case (i, j) =>
      when(agree(i) && agree(j), lit((i * 7 + j).toLong))
    }: _*)
    shiftrightunsigned(bk, 16) === minShared
  }

  /** Lossless Hamming-ball self-join over any 56-bit fingerprint column —
    * the blocked pair machinery [[imagePhashPairs]] documents, shared by
    * the image (dHash), audio (envelope) and video (frame-luma)
    * fingerprints so every modality's near-dup rides one implementation.
    * `hashes` must carry (doc_id, ph); returns (id_a, id_b, hamming),
    * each qualifying pair emitted EXACTLY once ([[canonicalBk]] — no
    * pair-stream distinct, no re-exchange).
    *
    * `bucketCap` > 0 arms the hot-bucket guard (the q21/q63 discipline,
    * r10 verdict #1): a large class of near-identical fingerprints (a
    * placeholder logo re-encoded across millions of pages) collapses
    * into one blocking key = one sort-merge match group doing O(class²)
    * work in a single task. With the guard, a per-key count SKEW-SPLITS
    * the keys (r12): under-cap keys — on a realistic corpus, ~all of
    * them — take the plain self-join unchanged, while each over-cap
    * key's membership splits into ⌈n/cap⌉ hash chunks joined
    * TRIANGLE-wise (side A explodes (g, hi ≥ g), side B (lo ≤ g, g) —
    * every chunk pair meets exactly once), so no task's candidate volume
    * exceeds ~cap² regardless of fingerprint skew, and — unlike the text
    * family's capped variant — losslessly: a pair's two sides share one
    * bk, so routing keys whole re-keys the SAME candidate set. Cost of
    * arming in the no-skew regime: one count aggregation + the count
    * join (the chunk grid only ever sees over-cap keys); leave it 0
    * (off) only when the corpus is exact-deduped upstream and
    * fingerprint classes are PROVABLY bounded.
    *
    * CAP SIZING (SCALING_r11): the per-task bound is ~cap², but the
    * exploded exchange volume is Σ n²/cap per hot key — a small cap
    * trades skew for volume. For million-member classes size the cap so
    * cap² fits a task comfortably while n/cap stays modest: ~1024 is
    * the production default (1M-candidate tasks, 64× less exchange
    * volume than cap 16). The q117b registration's cap 16 exists to
    * force engagement on the tiny driver corpus, not as guidance.
    */
  /** The production default for [[hammingPairs56]]'s `bucketCap` — the
    * CAP SIZING analysis above: ~1M-candidate tasks, 64× less exchange
    * volume than cap 16, engaged by default in the production entry
    * points ([[crossModalClusters]], CorpusPipeline's cross-modal stage).
    */
  val ProductionBucketCap: Int = 1024

  /** The plain banded self-join: one exchange (reused on both sides),
    * canonical-key single emission — serves the uncapped path, the
    * armed-but-no-hot-keys path, and the under-cap keys of a skew-split.
    */
  private def bandedSelfJoin(
      banded: DataFrame, maxHamming: Int,
      keyCols: Seq[String] = Seq("bk")): DataFrame = {
    val ham = bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("int")
    val sig = if (keyCols.contains("sig")) Seq(col("a.sig").as("sig")) else Nil
    banded.as("a")
      .join(banded.as("b"),
        keyCols.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
          && col("a.id") < col("b.id")
          && ham <= maxHamming
          && canonicalBk(col("a.ph"), col("b.ph"), col("a.bk"), maxHamming))
      .select(Seq(col("a.id").as("id_a"), col("b.id").as("id_b"),
        ham.as("hamming")) ++ sig: _*)
  }

  /** ONE banded pass over several fingerprint columns of the same
    * materialized table (r19): the three media modalities used to run
    * [[hammingPairs56]] each — three band explodes, three hot-key count
    * jobs, three self-join exchanges over the SAME 32-byte hash rows.
    * Tagging the banded stream with its signal and keying every join on
    * (sig, bk) folds them into one explode, one count, one self-join —
    * per-modality outputs identical (keys can never collide across
    * signals), spec-asserted against the per-modality path. Returns
    * (id_a, id_b, hamming, sig).
    */
  private[graft] def hammingPairs56Tagged(
      fp: DataFrame, signals: Seq[(String, String)],
      maxHamming: Int, bucketCap: Int): DataFrame = {
    require(maxHamming <= 5, "7-chunk pair blocking is only lossless for hamming <= 5")
    val perSig = signals.map { case (c, s) =>
      transform(array(bkExprs(col(c), maxHamming): _*),
        k => struct(lit(s).as("sig"), k.as("bk"), col(c).as("ph")))
    }
    val banded = fp
      .select(col("doc_id").as("id"), explode(concat(perSig: _*)).as("e"))
      .select(col("id"), col("e.sig").as("sig"), col("e.bk").as("bk"),
        col("e.ph").as("ph"))
    pairsOverBanded(banded, maxHamming, bucketCap, Seq("sig", "bk"))
  }

  def hammingPairs56(
      hashes: DataFrame, maxHamming: Int, bucketCap: Int = 0): DataFrame =
    pairsOverBanded(bandKeys56(hashes, maxHamming), maxHamming, bucketCap,
      Seq("bk"))

  /** The shared blocked-pair tail over a banded stream keyed by `keyCols`
    * — ("bk") for one modality, ("sig", "bk") for the tagged multi-signal
    * pass. All the capped-path guarantees ([[hammingPairs56]]'s scaladoc)
    * hold per key, and keys are disjoint across signals by construction.
    */
  private def pairsOverBanded(
      banded: DataFrame, maxHamming: Int, bucketCap: Int,
      keyCols: Seq[String]): DataFrame = {
    if (bucketCap <= 0) bandedSelfJoin(banded, maxHamming, keyCols)
    else {
      // SKEW-SPLIT, driver-decided (r12): a pair's two sides share one
      // bk, so one per-key count routes each key WHOLE down one of two
      // disjoint paths. The over-cap key set is BOUNDED (≤ |banded|/cap
      // rows) and checkpointed tiny; whether it is EMPTY is decided on
      // the driver, so on a realistic corpus — no key over cap — the
      // armed plan IS the uncapped plan plus one count pass (the first
      // r12 cut kept every key on the grid and checkpointed the full
      // 9M-row banded stream: measured 64.0 vs 38.5 s uncapped at 500k
      // docs in one session; this cut measures ~1.1×). Over-cap keys —
      // the placeholder-logo regime — take the chunk-triangle grid.
      // Both paths are complete per key and keys are disjoint, so the
      // split preserves losslessness AND exactly-once emission
      // (canonicalBk dedups across DIFFERENT keys, never within one).
      // The driver-side isEmpty is an action at plan-construction time —
      // the q103/q107b bounded-driver-step discipline, documented here.
      val hot = banded.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
        .filter(col("n") > bucketCap)
        .localCheckpoint()
      if (hot.isEmpty) return bandedSelfJoin(banded, maxHamming, keyCols)

      val smallPairs = bandedSelfJoin(
        banded.join(broadcast(hot.select(keyCols.map(col): _*)), keyCols, "left_anti"),
        maxHamming, keyCols)

      // only the HOT keys' rows reach the grid; materialize them once
      // (the q63 pc discipline) — in the degenerate regime that is ~the
      // whole stream, exactly the r11 behavior
      val pc = banded.join(broadcast(hot), keyCols)
        .withColumn("chunks", ceil(col("n") / lit(bucketCap)).cast("int"))
        .withColumn("g", pmod(xxhash64(col("id")), col("chunks")).cast("int"))
        .localCheckpoint()
        // the hot stream is SMALL (rows, not candidates), so AQE
        // coalesces it to ~1 partition — which would make each explode
        // below a single serial task over the FULL n²/cap exploded volume
        // (measured: 2×35 s single-task stages on the 50k-doc degenerate
        // corpus). Repartition by (bk, g) first: a hot class's rows carry
        // `chunks` distinct g values, so its explode work spreads across
        // the grid rows it is about to generate. The EXPLICIT partition
        // count is deliberate — byte-based AQE coalescing re-merges the
        // small pre-explode stream (rows ≠ work here) and re-serializes
        // the explode
        .repartition(banded.sparkSession.sessionState.conf.numShufflePartitions,
          (keyCols :+ "g").map(col): _*)
      val sig = if (keyCols.contains("sig")) Seq(col("sig")) else Nil
      val aSide = pc.select(sig ++ Seq(
        col("bk"), col("id").as("id_1"), col("ph").as("ph_1"),
        col("g").as("lo"), explode(sequence(col("g"), col("chunks") - 1)).as("hi")): _*)
      val bSide = pc.select(sig ++ Seq(
        col("bk"), col("id").as("id_2"), col("ph").as("ph_2"),
        explode(sequence(lit(0), col("g"))).as("lo"), col("g").as("hi")): _*)
      val ham = bit_count(col("ph_1").bitwiseXOR(col("ph_2"))).cast("int")
      // a (lo < hi) cell meets each cross pair once with arbitrary side
      // order; a (lo == hi) cell meets both orders — keep one.
      // The merge hint is load-bearing: Catalyst sizes both sides from
      // the pre-explode checkpoint (explode cardinality is opaque), so
      // on a hot corpus it happily plans a BROADCAST of a multi-GiB
      // exploded stream (measured: a 13.5 GiB broadcast attempt on the
      // 50k-doc degenerate corpus). Forcing sort-merge keeps the
      // exploded sides partitioned by (bk, lo, hi) — the grid cells the
      // guard exists to spread
      val hotPairs = aSide.hint("merge")
        .join(bSide.hint("merge"), keyCols ++ Seq("lo", "hi"))
        .filter((col("lo") < col("hi") || col("id_1") < col("id_2"))
          && col("id_1") =!= col("id_2")
          && ham <= maxHamming
          && canonicalBk(col("ph_1"), col("ph_2"), col("bk"), maxHamming))
        .select(Seq(least(col("id_1"), col("id_2")).as("id_a"),
          greatest(col("id_1"), col("id_2")).as("id_b"),
          ham.as("hamming")) ++ sig.map(_ => col("sig")): _*)
      smallPairs.unionByName(hotPairs)
    }
  }

  // ---------------------------------------------------------------- audio

  /** The PCM sample rates the synthetic corpus cycles through. */
  val WavRates: Array[Int] = Array(8000, 16000, 22050, 44100)

  /** Deterministic audio geometry for an n-byte payload with the given
    * channel count: 16-bit PCM, block align = 2·channels, data padded to a
    * whole number of sample frames.
    */
  def wavDims(n: Long, channels: Int): (Int, Long) = {
    val rate = WavRates((n % 4).toInt)
    val block = 2L * channels
    val nSamples = (n + block - 1) / block
    (rate, nSamples)
  }

  /** Real RIFF/WAVE container: `RIFF` size `WAVE`, a 16-byte PCM `fmt `
    * chunk, an optional `LIST INFO` chunk (every third id — so the decoder
    * has to actually WALK chunks, not assume data at offset 44), then the
    * `data` chunk holding the payload zero-padded to a frame boundary.
    */
  def encodeWav(payload: Array[Byte], channels: Int, withList: Boolean): Array[Byte] = {
    val (rate, nSamples) = wavDims(payload.length.toLong, channels)
    val block = 2 * channels
    val dataLen = (nSamples * block).toInt
    val listLen = if (withList) 12 else 0
    val size = 44 + listLen + dataLen
    val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(size - 8).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * block).putShort(block.toShort).putShort(16)
    if (withList)
      buf.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.put(payload, 0, math.min(payload.length, dataLen))
    buf.array()
  }

  /** Genuine WAV decode: verify the RIFF/WAVE magic, then walk the chunk
    * list reading each fourcc + little-endian size — `fmt ` yields the PCM
    * parameters, `data` the sample count; unknown chunks are skipped by
    * size (word-aligned), exactly as a real parser must. Malformed
    * containers raise, never decode to zeros.
    */
  def decodeWav(batch: Seq[MediaRecord]): Seq[AudioMeta] =
    batch.map { r =>
      val p = r.payload
      def fail(msg: String) =
        throw new IllegalArgumentException(s"doc ${r.doc_id}: $msg (${p.length} bytes)")
      if (p.length < 12 || new String(p, 0, 4, "US-ASCII") != "RIFF" ||
        new String(p, 8, 4, "US-ASCII") != "WAVE") fail("not a RIFF/WAVE container")
      val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var channels = 0; var rate = 0; var bits = 0; var block = 0
      var dataLen = -1L
      while (pos + 8 <= p.length && dataLen < 0) {
        val fourcc = new String(p, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        if (len < 0 || pos + 8 + len > p.length) fail(s"chunk $fourcc overruns container")
        fourcc match {
          case "fmt " =>
            if (len < 16) fail("fmt chunk too short")
            channels = buf.getShort(pos + 10).toInt
            rate = buf.getInt(pos + 12)
            block = buf.getShort(pos + 20).toInt
            bits = buf.getShort(pos + 22).toInt
          case "data" => dataLen = len.toLong
          case _ => () // skip unknown chunk (LIST, cue, ...)
        }
        pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      if (dataLen < 0) fail("no data chunk")
      if (channels <= 0 || rate <= 0 || block != channels * (bits / 8))
        fail(s"malformed fmt (channels=$channels rate=$rate block=$block bits=$bits)")
      val nSamples = dataLen / block
      AudioMeta(r.doc_id, "wav", p.length.toLong, rate, channels, bits,
        nSamples, nSamples * 1000L / rate)
    }

  // ---------------------------------------------------------------- video

  /** (movie timescale, per-frame duration in timescale units) pairs the
    * synthetic corpus cycles through — 24 fps at the classic 600 QuickTime
    * timescale, 25 fps at 1000, 24 fps at 12288, 30 fps at 90000 (the MPEG
    * transport timescale). Indexed by payload length so the decode is
    * discriminating.
    */
  val Mp4Clocks: Array[(Int, Int)] = Array((600, 25), (1000, 40), (12288, 512), (90000, 3000))

  /** Bytes of payload represented by one video frame in the synthetic
    * container (drives `stsz.sample_count`, so frame count scales with the
    * payload like a real clip's does with its duration).
    */
  val Mp4BytesPerFrame = 64

  /** Every `Mp4SampleStride`-th frame survives frame sampling. */
  val Mp4SampleStride = 10

  private def putBox(buf: java.nio.ByteBuffer, size: Int, fourcc: String): Unit = {
    buf.putInt(size); buf.put(fourcc.getBytes("US-ASCII")); ()
  }

  /** Real ISO-BMFF (MP4) container: `ftyp` (brand isom), an optional
    * top-level `free` box every third id (so the parser must skip unknown
    * boxes by size, not seek to fixed offsets), `moov` holding a version-0
    * `mvhd` plus one full `trak`→`mdia`→`minf`→`stbl`→`stsz` chain per
    * track (video track carries the frame table; the odd-id audio track's
    * `stsz` is empty), then `mdat` with the payload. Box sizes are
    * BIG-endian 32-bit — the opposite byte order from BMP/WAV, so the two
    * decoders cannot share a lazily-written reader.
    */
  def encodeMp4(payload: Array[Byte], id: Long): Array[Byte] = {
    val n = payload.length
    val (timescale, frameDur) = Mp4Clocks(n % 4)
    val nFrames = n / Mp4BytesPerFrame + 1
    val nTracks = 1 + (id % 2).toInt
    val withFree = id % 3 == 0
    val trakSize = 176 // 8 + tkhd 92 + (mdia 8 + mdhd 32 + (minf 8 + (stbl 8 + stsz 20)))
    val moovSize = 8 + 108 + trakSize * nTracks
    val size = 20 + (if (withFree) 16 else 0) + moovSize + 8 + n
    val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.BIG_ENDIAN)
    putBox(buf, 20, "ftyp")
    buf.put("isom".getBytes("US-ASCII")).putInt(0x200).put("mp41".getBytes("US-ASCII"))
    if (withFree) { putBox(buf, 16, "free"); buf.putLong(0L) }
    putBox(buf, moovSize, "moov")
    putBox(buf, 108, "mvhd")
    buf.putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation/modification time
      .putInt(timescale).putInt(nFrames * frameDur)
      .putInt(0x00010000).putShort(0x0100).putShort(0) // rate 1.0, volume, reserved
      .putLong(0L) // reserved
    putIdentityMatrix(buf)
    var i = 0
    while (i < 6) { buf.putInt(0); i += 1 } // pre_defined
    buf.putInt(nTracks + 1) // next_track_ID
    var track = 0
    while (track < nTracks) {
      val video = track == 0
      putBox(buf, trakSize, "trak")
      putBox(buf, 92, "tkhd")
      buf.putInt(0x000007) // version 0, flags enabled|in-movie|in-preview
        .putInt(0).putInt(0).putInt(track + 1).putInt(0) // times, track_ID, reserved
        .putInt(nFrames * frameDur).putLong(0L) // duration, reserved
        .putShort(0).putShort(0) // layer, alternate_group
        .putShort(if (video) 0 else 0x0100) // volume (audio only)
        .putShort(0)
      putIdentityMatrix(buf)
      buf.putInt(if (video) 320 << 16 else 0).putInt(if (video) 240 << 16 else 0)
      putBox(buf, 76, "mdia")
      putBox(buf, 32, "mdhd")
      buf.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(nFrames * frameDur)
        .putShort(0x55c4).putShort(0) // language 'und', pre_defined
      putBox(buf, 36, "minf")
      putBox(buf, 28, "stbl")
      putBox(buf, 20, "stsz")
      buf.putInt(0) // version + flags
        .putInt(if (video) Mp4BytesPerFrame else 0) // uniform sample_size
        .putInt(if (video) nFrames else 0) // sample_count
      track += 1
    }
    putBox(buf, 8 + n, "mdat")
    buf.put(payload, 0, n)
    buf.array()
  }

  private def putIdentityMatrix(buf: java.nio.ByteBuffer): Unit = {
    // 3x3 fixed-point unity matrix: 0x10000, 0, 0 / 0, 0x10000, 0 / 0, 0, 0x40000000
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    ()
  }

  /** Genuine ISO-BMFF walk: read each box's BIG-endian 32-bit size +
    * fourcc (honoring the spec's two escape sizes — `1` = 64-bit largesize
    * follows, `0` = box extends to end of file), verify the leading `ftyp`,
    * then DESCEND: `moov` → `mvhd` (timescale/duration, version 0 or 1) and
    * each `trak` → `mdia` → `minf` → `stbl` → `stsz` (summing
    * `sample_count` across tracks). Unknown boxes (`free`, `udta`, …) skip
    * by size at every level. Unlike WAV's flat chunk list this is a
    * recursive container format — the parser is a tree walk, and a
    * malformed tree (child overrunning its parent, missing `moov`/`mdat`,
    * zero timescale) raises instead of decoding to zeros.
    */
  def decodeMp4(batch: Seq[MediaRecord]): Seq[VideoMeta] =
    batch.map { r =>
      val p = r.payload
      def fail(msg: String) =
        throw new IllegalArgumentException(s"doc ${r.doc_id}: $msg (${p.length} bytes)")
      val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.BIG_ENDIAN)
      // returns (bodyStart, boxEnd) for the box at `pos` bounded by `limit`
      def boxBounds(pos: Long, limit: Long, fourcc: String): (Long, Long) = {
        val size = buf.getInt(pos.toInt).toLong & 0xffffffffL
        if (size == 0) (pos + 8, limit) // to end of enclosing scope
        else if (size == 1) {
          if (pos + 16 > limit) fail(s"box $fourcc: truncated largesize")
          (pos + 16, pos + buf.getLong(pos.toInt + 8))
        } else (pos + 8, pos + size)
      }
      def fourccAt(pos: Long): String = new String(p, pos.toInt + 4, 4, "US-ASCII")

      var timescale = 0; var durationUnits = 0L; var nTracks = 0; var nFrames = 0L
      var sawMoov = false; var sawMdat = false

      def walkStbl(start: Long, end: Long): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val fc = fourccAt(pos)
          val (body, boxEnd) = boxBounds(pos, end, fc)
          if (boxEnd > end) fail(s"box $fc overruns stbl")
          if (fc == "stsz") {
            if (body + 12 > boxEnd) fail("stsz too short")
            nFrames += buf.getInt(body.toInt + 8).toLong & 0xffffffffL
          }
          pos = boxEnd
        }
      }
      def walkContainer(start: Long, end: Long, child: String, f: (Long, Long) => Unit): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val fc = fourccAt(pos)
          val (body, boxEnd) = boxBounds(pos, end, fc)
          if (boxEnd > end) fail(s"box $fc overruns parent")
          if (fc == child) f(body, boxEnd)
          pos = boxEnd
        }
      }
      def walkTrak(start: Long, end: Long): Unit = {
        nTracks += 1
        walkContainer(start, end, "mdia", (ms, me) =>
          walkContainer(ms, me, "minf", (fs, fe) =>
            walkContainer(fs, fe, "stbl", walkStbl)))
      }
      def walkMoov(start: Long, end: Long): Unit = {
        sawMoov = true
        var pos = start
        while (pos + 8 <= end) {
          val fc = fourccAt(pos)
          val (body, boxEnd) = boxBounds(pos, end, fc)
          if (boxEnd > end) fail(s"box $fc overruns moov")
          fc match {
            case "mvhd" =>
              val version = p(body.toInt) & 0xff
              if (version == 1) { // 64-bit creation/modification times
                timescale = buf.getInt(body.toInt + 20)
                durationUnits = buf.getLong(body.toInt + 24)
              } else {
                timescale = buf.getInt(body.toInt + 12)
                durationUnits = buf.getInt(body.toInt + 16).toLong & 0xffffffffL
              }
            case "trak" => walkTrak(body, boxEnd)
            case _ => ()
          }
          pos = boxEnd
        }
      }

      if (p.length < 16 || fourccAt(0) != "ftyp") fail("not an ISO-BMFF container")
      var pos = 0L
      while (pos + 8 <= p.length) {
        val fc = fourccAt(pos)
        val (body, boxEnd) = boxBounds(pos, p.length.toLong, fc)
        if (boxEnd > p.length) fail(s"box $fc overruns container")
        fc match {
          case "moov" => walkMoov(body, boxEnd)
          case "mdat" => sawMdat = true
          case _ => () // ftyp, free, ...
        }
        pos = boxEnd
      }
      if (!sawMoov) fail("no moov box")
      if (!sawMdat) fail("no mdat box")
      if (timescale <= 0) fail(s"malformed mvhd (timescale=$timescale)")
      if (nTracks == 0) fail("moov has no trak")
      VideoMeta(r.doc_id, "mp4", p.length.toLong, timescale, durationUnits,
        durationUnits * 1000L / timescale, nTracks, nFrames,
        (nFrames + Mp4SampleStride - 1) / Mp4SampleStride)
    }

  /** Wrap the text corpus as MP4 records (utf-8 bytes as the `mdat`
    * payload): one video track, plus an audio track for odd ids, a `free`
    * box every third id.
    */
  def asVideo(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, "mp4", encodeMp4(text.getBytes("UTF-8"), id))
      }
  }

  /** q81: batched video-metadata extraction + stride frame sampling — the
    * same mapPartitions batch shape as [[extractMeta]]/[[decodeWav]], so a
    * real demuxer + frame decoder (which wants batches for codec reuse)
    * slots in without plumbing changes.
    */
  def videoMetaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    asVideo(docs).mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decodeMp4(batch))
    }.toDF()
  }

  /** Wrap the text corpus as WAV records: utf-8 bytes as PCM payload,
    * mono for even ids / stereo for odd, a LIST chunk every third id.
    */
  def asAudio(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        MediaRecord(id, "wav", encodeWav(bytes, 1 + (id % 2).toInt, id % 3 == 0))
      }
  }

  /** q72: batched audio-metadata extraction — the same mapPartitions batch
    * shape as [[extractMeta]], so a real resampler/feature extractor
    * (fbank, VAD) slots in without plumbing changes.
    */
  def audioMetaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    asAudio(docs).mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decodeWav(batch))
    }.toDF()
  }

  // ------------------------------------- perceptual fingerprints: audio/video

  /** 56-bit all-integer GRADIENT hash over any per-step magnitude
    * sequence — the temporal sibling of [[perceptualHash]]'s 8×8 spatial
    * grid, shared by the audio envelope and the video frame-luma
    * fingerprints. The sequence downsamples to 57 windows (step i owns
    * window i·57 div n — same integer cell map as the image grid) and bit
    * i in 0..55 compares consecutive window AVERAGES by
    * cross-multiplication (sum·cnt — no division, no float), so a copy
    * with shifted amplitude or a few edited steps keeps almost every bit
    * while an unrelated signal resamples to noise. Sequences shorter than
    * 57 steps leave trailing windows empty (cnt 0 — both comparisons
    * false); an empty sequence hashes to 0. 56 bits keeps the value
    * sign-safe as a BIGINT in both engines (the q22/q117 discipline).
    * Overflow margin, PER input domain (the cross-product is bounded by
    * window² · maxStep): byte-valued steps (video frame bytes, image
    * luma ≤ 765) stay inside a long up to ~10⁹ steps per window — far
    * beyond the JVM's 2 GB byte-array cap on any payload this container
    * can hold; 16-bit audio magnitudes (≤ 32767/step) only up to
    * ~1.7·10⁷ steps per window ≈ 1.9 GB of PCM per doc — in THIS
    * pipeline the 2 GB array cap binds first so the margin is real but
    * thin, and a heavier decoder feeding longer magnitude sequences must
    * clamp or rescale window sums before reusing this hash.
    */
  def gradientHash(vals: Array[Long]): Long = {
    val n = vals.length
    if (n == 0) return 0L
    val sums = new Array[Long](57)
    val cnts = new Array[Long](57)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 57 / n).toInt
      sums(w) += vals(i)
      cnts(w) += 1
      i += 1
    }
    var bits = 0L
    var b = 0
    while (b < 56) {
      if (sums(b) * cnts(b + 1) > sums(b + 1) * cnts(b)) bits |= 1L << b
      b += 1
    }
    bits
  }

  /** Decode a WAV payload to its rectified sample-magnitude envelope: the
    * real chunk walk ([[decodeWav]]'s rules — fmt for the PCM geometry,
    * data located by walking, word-aligned skips), then every signed
    * 16-bit LE sample contributes |sample|, channels in interleave order.
    * Rectification is the front half of any audio fingerprinter
    * (Chromaprint-class systems run the same rectified energy before
    * their filter banks). Full sample resolution — not a per-frame
    * downmix — makes the fingerprint CHANNEL-LAYOUT invariant: a mono →
    * stereo re-containering of the same byte stream yields the same
    * sample sequence (up to one trailing pad sample), where a per-frame
    * sum would move window boundaries and flip near-tie gradient bits
    * (measured at 6/56 on a one-sentence signal — outside the Hamming
    * ball this operator promises for re-containered copies). The
    * envelope — never the samples — is what leaves the decode.
    */
  def envelopeOf(r: MediaRecord): Array[Long] = {
    val p = r.payload
    def fail(msg: String) =
      throw new IllegalArgumentException(s"doc ${r.doc_id}: $msg (${p.length} bytes)")
    if (p.length < 12 || new String(p, 0, 4, "US-ASCII") != "RIFF" ||
      new String(p, 8, 4, "US-ASCII") != "WAVE") fail("not a RIFF/WAVE container")
    val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = 0; var bits = 0; var block = 0
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= p.length && dataLen < 0) {
      val fourcc = new String(p, pos, 4, "US-ASCII")
      val len = buf.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > p.length) fail(s"chunk $fourcc overruns container")
      fourcc match {
        case "fmt " =>
          if (len < 16) fail("fmt chunk too short")
          channels = buf.getShort(pos + 10).toInt
          block = buf.getShort(pos + 20).toInt
          bits = buf.getShort(pos + 22).toInt
        case "data" => dataOff = pos + 8; dataLen = len
        case _ => ()
      }
      pos += 8 + len + (len & 1)
    }
    if (dataLen < 0) fail("no data chunk")
    if (channels <= 0 || bits != 16 || block != 2 * channels)
      fail(s"unsupported PCM geometry (channels=$channels block=$block bits=$bits)")
    val nSamples = (dataLen / 2).toInt
    val out = new Array[Long](nSamples)
    var m = 0
    while (m < nSamples) {
      out(m) = math.abs(buf.getShort(dataOff + 2 * m).toLong)
      m += 1
    }
    out
  }

  /** (doc_id, ph) — the 56-bit audio envelope fingerprint per document,
    * batched-decode shape ([[extractMeta]]); only 8 bytes per doc leave
    * the scan, never samples.
    */
  def audioFingerprint(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // PCM decode is the heavy kernel — spread a narrow input (guide §2.5)
    asAudio(Spread.ifNarrow(docs.select(col("doc_id"), col("text")))).mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.map { r =>
        (r.doc_id, gradientHash(envelopeOf(r)))
      })
    }.toDF("doc_id", "ph")
  }

  /** Perceptual AUDIO near-dup pairs (SURVEY §2 q119) — the re-encoded /
    * re-contained / lightly-edited audio copy detector: mono and stereo
    * containers of the same signal share the interleaved rectified sample
    * stream ([[envelopeOf]]), so near copies land within a small Hamming
    * ball. Same lossless chunk-pair blocking as q117 ([[hammingPairs56]]).
    */
  def audioFingerprintPairs(
      docs: DataFrame, maxHamming: Int = 4, bucketCap: Int = 0): DataFrame =
    hammingPairs56(audioFingerprint(docs), maxHamming, bucketCap)

  /** Decode an MP4 payload to the byte-magnitude sequence of its
    * stride-sampled frames: the real box walk ([[decodeMp4]] supplies
    * frame count and geometry checks), the `mdat` body located by the same
    * top-level walk, then each SAMPLED frame (every [[Mp4SampleStride]]-th
    * — the frame-sample step a vision pipeline feeds its encoder)
    * contributes its [[Mp4BytesPerFrame]]-byte payload slice byte by byte
    * (bytes past the payload read as 0, matching the container's declared
    * frame table). Byte granularity — not one luma per frame — keeps the
    * fingerprint discriminating on SHORT clips too: a clip under
    * stride×frame bytes still yields a full first-frame signature, where a
    * per-frame rollup would collapse every short clip to a single step
    * (and so to one shared hash — measured as the all-pairs explosion
    * this design replaced). Two clips differing only in unsampled frames
    * fingerprint identically: inherent to frame sampling, exactly as a
    * keyframe-based video fingerprinter behaves.
    */
  def sampledFrameBytesOf(r: MediaRecord): Array[Long] = {
    val meta = decodeMp4(Seq(r)).head // full tree walk: validates + frame count
    val p = r.payload
    val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.BIG_ENDIAN)
    var pos = 0L
    var dataOff = -1L; var dataEnd = -1L
    while (pos + 8 <= p.length && dataOff < 0) {
      val size = buf.getInt(pos.toInt).toLong & 0xffffffffL
      val fourcc = new String(p, pos.toInt + 4, 4, "US-ASCII")
      val end = if (size == 0) p.length.toLong
        else if (size == 1) pos + buf.getLong(pos.toInt + 8)
        else pos + size
      if (fourcc == "mdat") {
        dataOff = if (size == 1) pos + 16 else pos + 8
        dataEnd = end
      }
      pos = end
    }
    // decodeMp4 already failed on a missing mdat; dataOff is set here
    val n = (dataEnd - dataOff).toInt
    val nSampled = meta.n_frames_sampled.toInt
    val out = new Array[Long](nSampled * Mp4BytesPerFrame)
    var j = 0
    while (j < nSampled) {
      val start = j.toLong * Mp4SampleStride * Mp4BytesPerFrame
      var k = 0
      while (k < Mp4BytesPerFrame) {
        out(j * Mp4BytesPerFrame + k) =
          if (start + k < n) (p((dataOff + start + k).toInt) & 0xff).toLong else 0L
        k += 1
      }
      j += 1
    }
    out
  }

  /** (doc_id, ph) — the 56-bit video fingerprint per document:
    * stride-sample the frames, gradient-hash the sampled frames' byte
    * stream ([[sampledFrameBytesOf]]). Pixels/frames never leave the
    * decode scan.
    */
  def videoFingerprint(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // frame decode is the heavy kernel — spread a narrow input (guide §2.5)
    asVideo(Spread.ifNarrow(docs.select(col("doc_id"), col("text")))).mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.map { r =>
        (r.doc_id, gradientHash(sampledFrameBytesOf(r)))
      })
    }.toDF("doc_id", "ph")
  }

  /** Perceptual VIDEO near-dup pairs (SURVEY §2 q120): re-containered or
    * lightly re-edited clips share their sampled-frame luma trajectory, so
    * copies land within a small Hamming ball while unrelated clips
    * resample to noise. Same lossless blocking as q117/q119.
    */
  def videoFingerprintPairs(
      docs: DataFrame, maxHamming: Int = 4, bucketCap: Int = 0): DataFrame =
    hammingPairs56(videoFingerprint(docs), maxHamming, bucketCap)

  /** All three media fingerprints in ONE corpus pass — (doc_id,
    * ph_image, ph_audio, ph_video). [[crossModalClusters]] and the
    * pipeline's cross-modal stage consume several modalities of the same
    * corpus; running [[imagePhash]]/[[audioFingerprint]]/
    * [[videoFingerprint]] separately re-reads the parquet and re-decodes
    * the containers once per modality (SCALING_r11: the two slowest q121
    * stages at 500k docs are decode scans). Here each record builds and
    * decodes its three containers inside one mapPartitions batch; only
    * the 32-byte hash rows leave the scan, and each downstream pair join
    * band-explodes the slim hash table instead of re-decoding. Container
    * choices mirror [[asMedia]]/[[asAudio]]/[[asVideo]] byte-for-byte
    * (spec-asserted equal to the per-modality fingerprints).
    */
  def mediaFingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the container encode/decode kernels run in the scan stage; spread a
    // narrow input first (opt guide §2.5 — no-op on multi-file scans)
    Spread.ifNarrow(docs.select(col("doc_id"), col("text")))
      .filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap(_.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val (w, h) = rasterDims(bytes.length.toLong)
          val img =
            if (id % 2 == 0) MediaRecord(id, "ppm", encodePpm(bytes, w, h))
            else MediaRecord(id, "bmp", encodeBmp(bytes, w, h))
          val (iw, ih, px) = rasterOf(img)
          val aud = MediaRecord(id, "wav",
            encodeWav(bytes, 1 + (id % 2).toInt, id % 3 == 0))
          val vid = MediaRecord(id, "mp4", encodeMp4(bytes, id))
          (id, perceptualHash(iw, ih, px), gradientHash(envelopeOf(aud)),
            gradientHash(sampledFrameBytesOf(vid)))
        })
      }.toDF("doc_id", "ph_image", "ph_audio", "ph_video")
  }

  /** Cross-modal near-dup CLUSTERS (SURVEY §2 q121) — ONE dedup decision
    * per document across every modality. A pipeline that dedups text,
    * images, audio and video independently keeps a document whose text
    * was rewritten but whose media is byte-identical (and vice versa);
    * the production rule is "near-dup under ANY signal ⇒ same cluster".
    * This unions the four verified pair tables — text minhash (q21),
    * image dHash (q117), audio envelope (q119), video frame-luma
    * (q120) — into one signal-tagged edge list, runs
    * [[Dedup.connectedComponents]] (min-label + pointer jumping) over the
    * union, and emits one row per CLUSTERED doc:
    *   (doc_id, component, n_members, signals)
    * where `signals` is the sorted distinct set of edge signals observed
    * anywhere in the component (comma-joined) — the audit column that
    * says WHY a cluster holds together (a "text"-only cluster is a
    * paraphrase set; an "audio,image,text,video" cluster is a true copy).
    * Docs in no pair emit nothing (churn-sized output, q88's discipline).
    *
    * Scale: the edge list is near-dup-OUTPUT-sized (never corpus²), built
    * once and localCheckpointed — components, the signal rollup and the
    * size rollup all reuse it without re-running the four pair pipelines.
    * Components cost O(|E|+|V|) shuffle per round for O(log diameter)
    * rounds; the per-component rollups are |components|-row tables that
    * AQE broadcasts back onto the member list.
    *
    * `bucketCap` arms [[hammingPairs56]]'s lossless hot-bucket guard on
    * all three media pair joins and defaults ON at the documented
    * production sizing: a placeholder logo re-encoded across millions of
    * pages is exactly the skew this production entry point must survive,
    * and the guard is lossless by construction, so arming it cannot
    * change the clusters. Pass 0 only when fingerprint classes are known
    * bounded and the extra count pass is worth skipping.
    */
  /** The signal-tagged cross-modal edge list [[crossModalClusters]] (and
    * CorpusPipeline's cross-modal stage) cluster over: text minhash plus
    * the three media fingerprint pair tables from ONE shared decode scan,
    * each tagged with its signal. Public so the plan audit can assert the
    * armed-by-default guard's shape on the UNcheckpointed union (the
    * cluster path checkpoints it, which hides the pair joins from the
    * final plan).
    */
  def crossModalPairs(
      docs: DataFrame, maxHamming: Int = 4,
      bucketCap: Int = ProductionBucketCap): DataFrame = {
    // one decode pass for all three media hashes (see [[mediaFingerprints]]);
    // the checkpoint pins the 32-byte rows, and the TAGGED single pass
    // ([[hammingPairs56Tagged]], r19) bands/counts/joins all three
    // modalities in one pipeline instead of three
    val fp = mediaFingerprints(docs).localCheckpoint()
    Dedup.minHashPairs(docs, "doc_id", "text")
        .select(col("id_a"), col("id_b"), lit("text").as("signal"))
      .unionByName(hammingPairs56Tagged(fp,
          Seq("ph_image" -> "image", "ph_audio" -> "audio", "ph_video" -> "video"),
          maxHamming, bucketCap)
        .select(col("id_a"), col("id_b"), col("sig").as("signal")))
  }

  def crossModalClusters(
      docs: DataFrame, maxHamming: Int = 4,
      bucketCap: Int = ProductionBucketCap): DataFrame = {
    val pairs = crossModalPairs(docs, maxHamming, bucketCap).localCheckpoint()
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val sig = pairs
      .join(comp.select(col("id").as("id_a"), col("component")), Seq("id_a"))
      .groupBy("component")
      .agg(array_join(sort_array(collect_set(col("signal"))), ",").as("signals"))
    val size = comp.groupBy("component").agg(count(lit(1)).as("n_members"))
    comp.select(col("id").as("doc_id"), col("component"))
      .join(size, Seq("component"))
      .join(sig, Seq("component"))
      .select(col("doc_id"), col("component"), col("n_members"), col("signals"))
  }
}
