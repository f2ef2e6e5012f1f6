package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Diacritics folding (accent-insensitive normalization) as a native
  * Catalyst expression — [[NfcNormalize]]'s sibling for the opposite
  * direction: decompose to NFD and drop combining marks, so 'crème' and
  * 'creme' hash/join identically. The textbook fold java.text exposes;
  * DuckDB's `strip_accents` is the parity oracle (q289), and the two
  * definitions coincide on all base+combining-mark decompositions.
  *
  * Same (b)-tier extension rationale as NfcNormalize: a codegen'd
  * `UnaryExpression` keeps the 100 TB normalization pass inside
  * whole-stage codegen instead of a per-row closure. Fast path: an
  * all-ASCII string (the overwhelming case) is returned untouched after
  * one byte scan, no transcoding or regex.
  */
case class FoldAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fold_accents requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "fold_accents"

  override protected def nullSafeEval(input: Any): Any =
    FoldAccents.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FoldAccents.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldAccents =
    copy(child = newChild)
}

object FoldAccents {
  /** Static helper so the generated (Janino) code is a single call. */
  def fold(s: UTF8String): UTF8String = {
    // ASCII fast path: UTF8String bytes are all < 0x80 ⇒ no accents
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (java.lang.Character.getType(cp) != java.lang.Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += java.lang.Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
