package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Block-format snappy decompression as a native Catalyst expression.
  *
  * The reference decompresses every Kafka payload with golang/snappy before
  * JSON-parsing it (`/root/reference/cmd/kafka-consumer/main.go:79`); xerial
  * snappy handles the same block format. A native expression (not a Scala
  * UDF) keeps the hot ingest path inside whole-stage codegen — no
  * SerDe/closure overhead per row, which matters when the path runs on
  * billions of messages.
  */
case class SnappyDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"snappy_decode requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "snappy_decode"

  /** Corrupt payloads decode to NULL (then flow to the dead-letter path)
    * rather than failing the task — the reference's S3 semantics: drop the
    * bad record, count it, keep consuming. Hence nullable even when the
    * child is not. */
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SnappyDecode.decodeOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SnappyDecode.decodeOrNull($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): SnappyDecode =
    copy(child = newChild)
}

object SnappyDecode {
  /** Codegen calls this static helper so checked IOExceptions never surface
    * in generated (Janino) code; a corrupt block yields null. */
  def decodeOrNull(bytes: Array[Byte]): Array[Byte] =
    try org.xerial.snappy.Snappy.uncompress(bytes)
    catch {
      case _: java.io.IOException => null
      case _: IllegalArgumentException => null
    }

  def compress(bytes: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(bytes)
}
