package graft.plans

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}

/** Native Catalyst expression: cosine similarity over two `array<float>`
  * embedding columns.
  *
  * Why not `zip_with` + `aggregate` higher-order functions? HOFs allocate a
  * lambda frame per element and box each float; this expression compiles to
  * a primitive `double` loop inside whole-stage codegen — the difference is
  * ~an order of magnitude on 64-dim vectors, which is the hot inner loop of
  * brute-force kNN (SURVEY §2 `q25_knn_brute`) and embedding near-dup
  * (`q24_embed_neardup`).
  *
  * Accumulates in `double` left-to-right, so results are deterministic and
  * independent of partitioning. Mismatched vector lengths raise at runtime
  * (silent truncation would mask corrupt data at 100 TB).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    VectorKernels.cosine(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorKernels.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native cosine over two `array<tinyint>` SYMMETRICALLY-quantized vectors
  * (`Embeddings.quantizeSym`: q = round(v/absmax·127)) — the compute path
  * of the int8 store. With one global scale, the scale cancels out of
  * cosine algebraically, so the similarity is computed EXACTLY over the
  * integer codes: an int-multiply dot loop with long accumulators, no
  * dequantization, no float array allocation, 4× less memory traffic than
  * the float kernel — the difference between scan-bound and compute-bound
  * on a billion-vector sweep.
  */
case class Int8CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineInt8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorKernels.cosineInt8($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernels shared by interpreted eval and generated code (same
  * pattern as [[HashKernels]]: one static call inside whole-stage codegen,
  * small enough for the JIT, no boxing).
  */
object VectorKernels {

  /** JL ±1 sign projection of an `array<float>` vector to `outDim` dims
    * on the exact 6-dp grid (SURVEY §2 `q75_random_projection`). Each
    * entry quantizes ONCE via BigDecimal HALF_UP — bit-identical to
    * Spark's `round(v*1e6)` and DuckDB's `round()` half-away-from-zero
    * (`Math.round` would differ on negative halves) — then `outDim`
    * long-accumulator sign folds. Same value set as the HOF
    * `aggregate`/`zip_with` formulation, ~10× cheaper (no per-element
    * lambda interpretation).
    */
  def signProject(v: ArrayData, outDim: Int): ArrayData = {
    val n = v.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = new java.math.BigDecimal(v.getFloat(i).toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0L
      var k = 0
      while (k < n) {
        val h = ((k + 13L) * (j + 101L) * 2654435761L) % 2147483647L
        s += (if ((h & 1L) == 0L) q(k) else -q(k))
        k += 1
      }
      out(j) = s.toDouble / 1e6
      j += 1
    }
    new GenericArrayData(out)
  }

  def cosineInt8(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"cosineSimilarityInt8: vector lengths differ (${n} vs ${y.numElements()})")
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < n) {
      val xi: Int = x.getByte(i)
      val yi: Int = y.getByte(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0L || ny == 0L) 0.0
    // sqrt each norm separately: nx*ny overflows Long past ~1M dims
    else dot / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
  }

  /** Merge-walk dot of two LONG-keyed sparse vectors (sorted ascending by
    * key; keys are xxhash64(term), hashed once per posting upstream —
    * r10 replaced the original UTF8String-keyed merge, which paid a
    * per-element string allocation + byte-compare per CANDIDATE, ~5× the
    * long-compare cost in the q63 verify hot loop).
    */
  def sparseDotLongKeys(ka: ArrayData, va: ArrayData, kb: ArrayData, vb: ArrayData): Long = {
    val na = ka.numElements(); val nb = kb.numElements()
    var i = 0; var j = 0; var dot = 0L
    while (i < na && j < nb) {
      val x = ka.getLong(i); val y = kb.getLong(j)
      if (x == y) { dot += va.getLong(i) * vb.getLong(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    dot
  }

  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"cosineSimilarity: vector lengths differ (${n} vs ${y.numElements()})")
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def splitMix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val LshMaxDim = 256
  private val MaxPlanes = 128

  /** Fixed pseudo-random hyperplanes (uniform in [-1, 1], SplitMix64
    * stream — deterministic across JVMs/executors). Vectors longer than
    * [[LshMaxDim]] use only the first [[LshMaxDim]] components.
    */
  val Hyperplanes: Array[Array[Double]] =
    Array.tabulate(MaxPlanes, LshMaxDim) { (p, i) =>
      splitMix64(p.toLong * LshMaxDim + i).toDouble / Long.MaxValue.toDouble
    }

  /** The `nprobe` cells with highest dot(v, centroid), descending, ties to
    * the lowest cell id. Small nlist → simple selection loop beats a heap.
    */
  def nearestCells(v: ArrayData, centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val nlist = centroids.length
    val dots = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val ctr = centroids(c)
      val n = math.min(v.numElements(), ctr.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * ctr(i); i += 1 }
      dots(c) = dot
      c += 1
    }
    val out = new Array[Any](nprobe)
    val taken = new Array[Boolean](nlist)
    var p = 0
    while (p < nprobe) {
      var best = -1; var bestDot = Double.MinValue
      var j = 0
      while (j < nlist) {
        if (!taken(j) && dots(j) > bestDot) { bestDot = dots(j); best = j }
        j += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Spark `round(x, 0)` twin for the 6-dp grid: BigDecimal HALF_UP on a
    * double rounds .5 AWAY FROM ZERO — `Math.round` (floor(x+0.5)) differs
    * on negative .5 boundaries, and the PQ encode kernel must land on the
    * exact grid longs the `grid()` column produced at training time.
    */
  private def grid6(x: Double): Long = {
    // Math.round alone rounds -0.5 to 0 (half-toward-+inf), and a naive
    // floor(y+0.5) rounds the double just below .5 (0.49999999999999994)
    // UP because y+0.5 carries to 1.0 — Math.round special-cases exactly
    // that boundary. Math.round on the magnitude with the sign restored is
    // away-from-zero AND boundary-exact, matching Spark round() everywhere.
    val y = x * 1e6
    if (y >= 0) Math.round(y) else -Math.round(-y)
  }

  /** PQ encode: per subspace, the exact-long argmin over that subspace's
    * grid codebook (first index on ties — the KMeans.assignTo rule).
    * `books(s)(c)` is subspace s's code-c centroid on the 6-dp grid.
    * Returns the m code indices. One tight loop replaces m·k HOF folds
    * (codegen fallback) or an inline expansion Janino cannot compile.
    */
  def pqEncode(v: ArrayData, books: Array[Array[Array[Long]]]): ArrayData = {
    val m = books.length
    val sub = if (m > 0 && books(0).nonEmpty) books(0)(0).length else 0
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val base = s * sub
      val book = books(s)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dsum = 0L
        var j = 0
        while (j < sub) {
          val d = grid6(v.getFloat(base + j).toDouble) - cent(j)
          dsum += d * d
          j += 1
        }
        if (dsum < bestD) { bestD = dsum; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC lookup sum: Σ_s lut(s)(codes(s)) — the per-row work of a PQ
    * scan, m array loads and adds inside whole-stage codegen.
    */
  def pqAdc(codes: ArrayData, lut: Array[Array[Long]]): Long = {
    var s = 0
    var sum = 0L
    while (s < lut.length) { sum += lut(s)(codes.getInt(s)); s += 1 }
    sum
  }

  /** ADC lookup sum against the LUT selected by the row's query index:
    * Σ_s luts(qidx)(s)(codes(s)) — the per-row work of an IVF-pruned PQ
    * scan where each row carries which probing query it matched.
    */
  def pqAdcIdx(codes: ArrayData, qidx: Int, luts: Array[Array[Array[Long]]]): Long = {
    val lut = luts(qidx)
    var s = 0
    var sum = 0L
    while (s < lut.length) { sum += lut(s)(codes.getInt(s)); s += 1 }
    sum
  }

  /** Multi-table random-hyperplane sign hash: returns `tables` bucket ids,
    * one per table, each over `bits` hyperplanes (table t uses planes
    * [t*bits, (t+1)*bits)). Bucket ids are table-tagged (t << bits | hash)
    * so a single equi-join key distinguishes tables.
    */
  def lshBuckets(v: ArrayData, bits: Int, tables: Int): ArrayData = {
    require(bits * tables <= MaxPlanes, s"bits*tables must be <= $MaxPlanes")
    val n = math.min(v.numElements(), LshMaxDim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val plane = Hyperplanes(t * bits + b)
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += v.getFloat(i).toDouble * plane(i)
          i += 1
        }
        if (dot > 0.0) bucket |= (1 << b)
        b += 1
      }
      out(t) = (t << bits) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Multiprobe variant of [[lshBuckets]]: per table, the exact bucket
    * PLUS the `probes` flip-1-bit neighbor buckets with the smallest
    * |dot| margin — the sign bits most likely to differ for a true
    * neighbor are exactly the ones whose hyperplane the vector sits
    * closest to (Lv et al., multi-probe LSH). Probing neighbors raises
    * recall at a FIXED table count: flipping the weakest bit reaches the
    * bucket a near-neighbor most probably landed in, where the classic
    * fix (more tables) pays another full corpus explode per table.
    * Returns `tables * (1 + min(probes, bits))` table-tagged ints,
    * exact bucket first per table (probe order is diagnostic only —
    * consumers treat the array as a key set).
    */
  def lshProbeBuckets(v: ArrayData, bits: Int, tables: Int, probes: Int): ArrayData = {
    require(bits * tables <= MaxPlanes, s"bits*tables must be <= $MaxPlanes")
    val p = math.min(probes, bits)
    val n = math.min(v.numElements(), LshMaxDim)
    val out = new Array[Int](tables * (1 + p))
    val dots = new Array[Double](bits)
    val taken = new Array[Boolean](bits)
    var t = 0
    var o = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val plane = Hyperplanes(t * bits + b)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v.getFloat(i).toDouble * plane(i); i += 1 }
        dots(b) = dot
        taken(b) = false
        if (dot > 0.0) bucket |= (1 << b)
        b += 1
      }
      out(o) = (t << bits) | bucket
      o += 1
      var j = 0
      while (j < p) {
        var best = -1
        var bestAbs = Double.MaxValue
        var q = 0
        while (q < bits) {
          val a = math.abs(dots(q))
          if (!taken(q) && a < bestAbs) { bestAbs = a; best = q }
          q += 1
        }
        taken(best) = true
        out(o) = (t << bits) | (bucket ^ (1 << best))
        o += 1
        j += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Sorted-merge sparse dot product over two quantized, LONG-keyed
  * term-weight vectors: `(keys_a sorted asc, wns_a, keys_b sorted asc,
  * wns_b) → Σ wn_a·wn_b` over shared keys — the verification kernel of
  * TF-IDF cosine pairs (SURVEY §2 `q63_tfidf_cosine_pairs`). A key is
  * the term's xxhash64, hashed ONCE per (doc, term) posting upstream
  * instead of string-compared once per candidate the posting reaches
  * (r10 — this replaced a UTF8String-keyed variant, ~5× slower in the
  * verify hot loop).
  *
  * Why an expression and not a re-join? Verifying a candidate pair by
  * re-joining the (doc, term, wn) table term-at-a-time costs two shuffles
  * and a 2·|terms| row explosion PER PAIR; this kernel walks the two
  * sorted arrays once inside whole-stage codegen — candidate verification
  * becomes a map over the pair list. Weights are the 6-dp quantized
  * LONGs, so the sum is an exact integer: deterministic,
  * order-independent, engine-identical. The (astronomically unlikely,
  * ~L²/2⁶⁵ per pair) xxhash64 key collision would perturb the dot and
  * surface as an oracle mismatch — the q71 gram-hash discipline, where
  * the cross-engine twin doubles as the collision check.
  */
case class SparseDotLongKeys(
    keysA: Expression, wnsA: Expression, keysB: Expression, wnsB: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def first: Expression = keysA
  override def second: Expression = wnsA
  override def third: Expression = keysB
  override def fourth: Expression = wnsB

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType),
      ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    VectorKernels.sparseDotLongKeys(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.plans.VectorKernels.sparseDotLongKeys($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(keysA = f, wnsA = s, keysB = t, wnsB = q)
}

/** JL ±1 sign projection of an `array<float>` vector to `outDim`
  * dimensions on the exact 6-dp grid (see [[VectorKernels.signProject]]).
  * Returns `array<double>` of length `outDim`.
  */
case class SignProject(child: Expression, outDim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.signProject(input.asInstanceOf[ArrayData], outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorKernels.signProject($c, $outDim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multi-table random-hyperplane LSH bucket ids of an `array<float>`
  * vector — the blocking keys for the ANN scale path (SURVEY §2
  * `q26_knn_lsh`). Returns `array<int>` of length `tables`.
  */
case class LshBuckets(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.lshBuckets(input.asInstanceOf[ArrayData], bits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorKernels.lshBuckets($c, $bits, $tables);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multiprobe LSH bucket ids of an `array<float>` vector: per table, the
  * exact bucket plus the `probes` smallest-margin flip-1-bit neighbors
  * (see [[VectorKernels.lshProbeBuckets]]). Used on the QUERY/probe side
  * only — the corpus side keeps the exact [[LshBuckets]] keys, so the
  * corpus explode never grows with the probe count. Returns `array<int>`
  * of length `tables * (1 + min(probes, bits))`.
  */
case class LshProbeBuckets(child: Expression, bits: Int, tables: Int, probes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.lshProbeBuckets(input.asInstanceOf[ArrayData], bits, tables, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorKernels.lshProbeBuckets($c, $bits, $tables, $probes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest centroid cell ids of an `array<float>` vector, by
  * dot product against L2-normalized centroids (== cosine order), ties to
  * the lowest cell id. Centroid matrix travels as an expression reference
  * object (broadcast with the serialized plan, referenced from generated
  * code via `addReferenceObj` — no closure capture, stays codegen'd).
  */
case class NearestCells(child: Expression, centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nprobe >= 1 && nprobe <= centroids.length, "1 <= nprobe <= nlist")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCells(input.asInstanceOf[ArrayData], centroids, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorKernels.nearestCells($c, $ref, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ code assignment of an `array<float>` vector against literal grid
  * codebooks (see [[VectorKernels.pqEncode]]); the codebooks travel as an
  * expression reference object (the [[NearestCells]] pattern). Returns
  * `array<int>` of length m.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Long]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqEncode(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorKernels.pqEncode($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC lookup-sum of an `array<int>` PQ code row against one query's
  * literal LUT (see [[VectorKernels.pqAdc]]). Returns the exact long
  * approximate dot product.
  */
case class PqAdc(child: Expression, lut: Array[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqAdc(input.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lut", lut, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VectorKernels.pqAdc($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC lookup-sum where the LUT is picked by the row's query-index column
  * (see [[VectorKernels.pqAdcIdx]]); all queries' LUTs travel as ONE
  * reference object. Returns the exact long approximate dot product.
  */
case class PqAdcIdx(codes: Expression, qidx: Expression, luts: Array[Array[Array[Long]]])
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = codes
  override def right: Expression = qidx

  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType), IntegerType)

  override def dataType: DataType = LongType

  override def nullSafeEval(c: Any, q: Any): Any =
    VectorKernels.pqAdcIdx(c.asInstanceOf[ArrayData], q.asInstanceOf[Int], luts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("luts", luts, "long[][][]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.plans.VectorKernels.pqAdcIdx($c, $q, $ref);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(codes = l, qidx = r)
}

object VectorFunctions {
  /** Column API for [[CosineSimilarity]]. */
  def cosineSimilarity(a: Column, b: Column): Column =
    GraftColumnShim.column(
      CosineSimilarity(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column API for [[Int8CosineSimilarity]]. */
  def cosineSimilarityInt8(a: Column, b: Column): Column =
    GraftColumnShim.column(
      Int8CosineSimilarity(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column API for [[SparseDotLongKeys]]. */
  def sparseDotLongKeys(ka: Column, wa: Column, kb: Column, wb: Column): Column =
    GraftColumnShim.column(SparseDotLongKeys(
      GraftColumnShim.expression(ka), GraftColumnShim.expression(wa),
      GraftColumnShim.expression(kb), GraftColumnShim.expression(wb)))

  /** Column API for [[SignProject]]. */
  def signProject(v: Column, outDim: Int): Column =
    GraftColumnShim.column(SignProject(GraftColumnShim.expression(v), outDim))

  /** Column API for [[LshBuckets]]. */
  def lshBuckets(v: Column, bits: Int, tables: Int): Column =
    GraftColumnShim.column(LshBuckets(GraftColumnShim.expression(v), bits, tables))

  /** Column API for [[LshProbeBuckets]]. */
  def lshProbeBuckets(v: Column, bits: Int, tables: Int, probes: Int): Column =
    GraftColumnShim.column(
      LshProbeBuckets(GraftColumnShim.expression(v), bits, tables, probes))

  /** Column API for [[NearestCells]]. */
  def nearestCells(v: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    GraftColumnShim.column(NearestCells(GraftColumnShim.expression(v), centroids, nprobe))

  /** Column API for [[PqEncode]]. */
  def pqEncode(v: Column, books: Array[Array[Array[Long]]]): Column =
    GraftColumnShim.column(PqEncode(GraftColumnShim.expression(v), books))

  /** Column API for [[PqAdc]]. */
  def pqAdc(codes: Column, lut: Array[Array[Long]]): Column =
    GraftColumnShim.column(PqAdc(GraftColumnShim.expression(codes), lut))

  /** Column API for [[PqAdcIdx]]. */
  def pqAdcIdx(codes: Column, qidx: Column, luts: Array[Array[Array[Long]]]): Column =
    GraftColumnShim.column(PqAdcIdx(
      GraftColumnShim.expression(codes), GraftColumnShim.expression(qidx), luts))
}
