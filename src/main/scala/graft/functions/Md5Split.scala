package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5(s) split into two 56-bit longs — `[h1, h2]` — in ONE digest pass
  * with no hex-string round trip.
  *
  * The dedup family's entire hashing budget is one md5 per shingle whose
  * digest splits into h1/h2 (see `TextDedup.shingleRowsFor`); the original
  * formulation materialized the 32-char hex string and parsed it back with
  * two `conv(substring(m, …), 16, 10)` calls — a general-radix string
  * parser each allocating intermediate UTF8Strings, measured as a top term
  * of the signature-stage cpu at production width (SCALE.md, k=64 profile).
  * This expression assembles the SAME two values directly from the digest
  * bytes: hex chars 1–14 are digest bytes 0–6 big-endian (h1), hex chars
  * 15–28 are bytes 7–13 (h2) — bit-exact with the conv() path by
  * construction (Md5SplitSpec property-checks equality against it), so
  * every dedup oracle that recomputes md5 in SQL still matches.
  *
  * Stays inside whole-stage codegen via the static helper, like
  * [[SnappyDecode]]. Reference behavior anchor: the reference fingerprints
  * nothing (its payloads are opaque —
  * `/root/reference/pkg/converter/converter.go:52-57`); this hash family
  * exists for the LLM-pipeline dedup operators.
  */
case class Md5Split(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_split requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_split"

  override protected def nullSafeEval(input: Any): Any =
    Md5Split.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Split.split($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Split =
    copy(child = newChild)
}

object Md5Split {
  // MessageDigest is stateful; one instance per task thread, reset by
  // digest() itself. getInstance per row would dominate the hash cost.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry for generated (Janino) code. */
  def split(s: UTF8String): GenericArrayData = {
    val digest = md.get().digest(s.getBytes)
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (digest(i) & 0xffL); i += 1 }
    var h2 = 0L
    while (i < 14) { h2 = (h2 << 8) | (digest(i) & 0xffL); i += 1 }
    new GenericArrayData(Array(h1, h2))
  }
}
