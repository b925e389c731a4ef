package graft.plans

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType}

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

object VectorFunctions {
  /** Column API for [[CosineSimilarity]]. */
  def cosineSimilarity(a: Column, b: Column): Column =
    GraftColumnShim.column(
      CosineSimilarity(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column API for [[Int8CosineSimilarity]]. */
  def cosineSimilarityInt8(a: Column, b: Column): Column =
    GraftColumnShim.column(
      Int8CosineSimilarity(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column API for [[LshBuckets]]. */
  def lshBuckets(v: Column, bits: Int, tables: Int): Column =
    GraftColumnShim.column(LshBuckets(GraftColumnShim.expression(v), bits, tables))

  /** Column API for [[NearestCells]]. */
  def nearestCells(v: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    GraftColumnShim.column(NearestCells(GraftColumnShim.expression(v), centroids, nprobe))
}
