package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Text curation needs canonical composition before hashing or dedup:
  * visually identical strings with decomposed combining marks (e.g.
  * "e" + U+0301 vs the precomposed "é") would otherwise fingerprint as
  * distinct documents and defeat exact dedup. Spark has no built-in
  * normalizer, so this is the (b)-tier extension path from SURVEY.md §5 —
  * a codegen'd `UnaryExpression`, not a Scala UDF: the hot path stays
  * inside whole-stage codegen with zero closure/SerDe cost per row, which
  * is what you want when the pass runs over 100 TB of text. Parity oracle:
  * DuckDB's `nfc_normalize`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static helper so the generated (Janino) code is a single call; the
    * common already-normalized case returns the input untouched (NFC
    * quick-check via isNormalized — no allocation on the fast path). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
