package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code.
  *
  * Codegen for these expressions emits a single static call instead of
  * inlining the loops — the call stays inside whole-stage codegen (no
  * `CodegenFallback`, no boxing of the row) while keeping the generated
  * method small enough for the JIT.
  */
object HashKernels {

  /** SplitMix64 — deterministic seed stream for the minhash permutations. */
  private def splitMix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val NumHashes = 128
  /** Odd multipliers + offsets for the k universal-hash permutations
    * g_i(x) = a_i * x + b_i over Z_2^64 (compared unsigned).
    */
  val MinHashA: Array[Long] = Array.tabulate(NumHashes)(i => splitMix64(2L * i) | 1L)
  val MinHashB: Array[Long] = Array.tabulate(NumHashes)(i => splitMix64(2L * i + 1))

  /** MinHash signature of a set of string shingles: for each of k
    * permutations, the unsigned-min of g_i(xxhash64(shingle)).
    */
  def minHashSignature(shingles: ArrayData): ArrayData = {
    val k = NumHashes
    val mins = Array.fill(k)(-1L) // unsigned max
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      val h = XXH64.hashUTF8String(s, 42L)
      var i = 0
      while (i < k) {
        val g = MinHashA(i) * h + MinHashB(i)
        if (java.lang.Long.compareUnsigned(g, mins(i)) < 0) mins(i) = g
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  val SimHashBits = 60
  private val PolyMod1 = 1000000007L
  private val PolyMod2 = 1000000009L

  /** Polynomial hash of a token's UTF-8 bytes: h = (h*base + byte) mod m.
    * Byte-identical to the ANSI-SQL twin (per-char `ascii()` reduce) on
    * ASCII text, which the synthetic corpus is.
    */
  def polyHash(s: UTF8String, base: Long, mod: Long): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xffL)) % mod
      i += 1
    }
    h
  }

  /** 60-bit token hash from two independent polynomial hashes (30 bits
    * each) — reproducible in ANSI SQL, unlike xxhash64, so the SimHash
    * oracle can be exact.
    */
  def tokenHash60(s: UTF8String): Long = {
    val h1 = polyHash(s, 31L, PolyMod1) & ((1L << 30) - 1)
    val h2 = polyHash(s, 131L, PolyMod2) & ((1L << 30) - 1)
    (h1 << 30) | h2
  }

  /** Distinct space-joined word n-gram shingles in one pass, exactly
    * matching `array_distinct(transform(..., slice(split(text," "),...)))`
    * semantics (java `split(" ", -1)` tokenization, first-occurrence
    * order) — but ~10× cheaper than the HOF chain: no per-shingle array
    * slices, one LinkedHashSet, one StringBuilder.
    */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Hashed bag-of-ngrams featurizer (DSIR, q90): every word n-gram of
    * the text for n ∈ [nMin, nMax], NON-distinct (importance weights are
    * count-weighted), each hashed to `polyHash(gram, 31, 10⁹+7) mod
    * buckets`. One pass, one StringBuilder — the same single-pass shape
    * as [[shingleSet]]; the polynomial hash is what keeps the ANSI-SQL
    * twin exact (per-char `ascii()` reduce on ASCII text).
    */
  def ngramBuckets(text: UTF8String, nMin: Int, nMax: Int, buckets: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var n = nMin
    while (n <= nMax) {
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out += (polyHash(UTF8String.fromString(sb.toString), 31L, PolyMod1)
          % buckets).toInt
        i += 1
      }
      n += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** 60-bit SimHash over tokens (duplicates weighted): bit i of the result
    * is 1 iff more than half of the token occurrences have bit i set.
    */
  def simHash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](SimHashBits)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val h = tokenHash60(tokens.getUTF8String(j))
      var i = 0
      while (i < SimHashBits) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < SimHashBits) {
      if (2 * counts(i) > n) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** MinHash signature expression: `array<string>` shingles → `array<long>`
  * of [[HashKernels.NumHashes]] minimums. See SURVEY §2 `q21_dedup_minhash`.
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.minHashSignature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashKernels.minHashSignature($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash expression: `array<string>` tokens → 60-bit fingerprint long.
  * See SURVEY §2 `q22_dedup_simhash`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashKernels.simHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass distinct word n-gram shingles: `string` text →
  * `array<string>`. See [[HashKernels.shingleSet]].
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashKernels.shingleSet($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed bag-of-ngrams features: `string` text → `array<int>` bucket ids
  * (non-distinct). See [[HashKernels.ngramBuckets]].
  */
case class NgramBuckets(child: Expression, nMin: Int, nMax: Int, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.ngramBuckets(input.asInstanceOf[UTF8String], nMin, nMax, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashKernels.ngramBuckets($c, $nMin, $nMax, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  def minHashSignature(shingles: Column): Column =
    GraftColumnShim.column(MinHashSignature(GraftColumnShim.expression(shingles)))

  def simHash64(tokens: Column): Column =
    GraftColumnShim.column(SimHash64(GraftColumnShim.expression(tokens)))

  def shingleSet(text: Column, n: Int): Column =
    GraftColumnShim.column(ShingleSet(GraftColumnShim.expression(text), n))

  def ngramBuckets(text: Column, nMin: Int, nMax: Int, buckets: Int): Column =
    GraftColumnShim.column(
      NgramBuckets(GraftColumnShim.expression(text), nMin, nMax, buckets))
}
