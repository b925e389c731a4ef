package graft.plans

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-normalization kernels (SURVEY §2 q109). */
object StringKernels {

  /** Unicode NFC + control-character strip — the canonical text cleanup a
    * crawl pipeline applies before hashing/deduping (decomposed accents
    * and stray C0/C1 controls make byte-identical text hash differently):
    *  - canonical composition (java.text.Normalizer NFC — the same
    *    normal form DuckDB's `nfc_normalize` produces, so the oracle can
    *    recompute the result),
    *  - drop C0 controls except \t \n \r, drop DEL (0x7F) and C1
    *    controls (0x80–0x9F).
    * Pure function of the input string; null-through.
    */
  def nfcClean(s: UTF8String): UTF8String = {
    val in = s.toString
    val nfc =
      if (java.text.Normalizer.isNormalized(in, java.text.Normalizer.Form.NFC)) in
      else java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC)
    var i = 0
    var dirty = false
    while (i < nfc.length && !dirty) {
      val c = nfc.charAt(i)
      dirty = isStripped(c)
      i += 1
    }
    val out =
      if (!dirty) nfc
      else {
        val b = new java.lang.StringBuilder(nfc.length)
        var j = 0
        while (j < nfc.length) {
          val c = nfc.charAt(j)
          if (!isStripped(c)) b.append(c)
          j += 1
        }
        b.toString
      }
    if (out eq in) s else UTF8String.fromString(out)
  }

  private def isStripped(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\r') ||
      (c >= 0x7f && c <= 0x9f)
}

/** NFC + control-strip normalization of a string column (see
  * [[StringKernels.nfcClean]]).
  */
case class NfcClean(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    StringKernels.nfcClean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.StringKernels.nfcClean($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringFunctions {
  /** Column API for [[NfcClean]]. */
  def nfcClean(s: Column): Column =
    GraftColumnShim.column(NfcClean(GraftColumnShim.expression(s)))
}
