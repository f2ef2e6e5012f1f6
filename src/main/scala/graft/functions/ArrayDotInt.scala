package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, NullType, ShortType}

/** Integer twin of [[ArrayDot]]: exact BIGINT dot product over two integer
  * array columns as a native Catalyst expression with codegen.
  *
  * The quantized-ANN scan (q139) scores every corpus vector with
  * `aggregate(zip_with(cv, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)`
  * over int8-quantized vectors held as ARRAY<BIGINT> — the one vector hot
  * path that was still an interpreted higher-order function after the
  * double-typed `graft_dot` landed (round-6 verdict task 7). Integer
  * addition is associative and exact, so unlike the float twin there is no
  * fold-order subtlety: any summation order gives the same BIGINT, and the
  * DuckDB oracle's list_sum/list_transform matches bit-for-bit by
  * arithmetic identity rather than by matched evaluation order.
  *
  * Null semantics mirror the HOF composition (and [[ArrayDot]]): null
  * array → null; a null element → null; length mismatch → null (zip_with
  * pads the short side with null, which nulls the HOF sum). NullType
  * element types (bare array() literals) are accepted: empty → 0,
  * non-empty → NULL via the null-element short-circuit.
  *
  * Overflow is the caller's contract, as it is for the HOF: int8×int8×dim
  * dots peak at 127·127·dim ≪ 2^63. */
case class ArrayDotInt(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_int"

  private val okElem: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, NullType)

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if Seq(lt, rt).forall(okElem) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_dot_int requires two ARRAY<TINYINT|SMALLINT|INT|BIGINT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // ArrayData accessor matching the element width; NullType arrays never
  // reach a getter (every element is null → short-circuit).
  private def getter(t: DataType): (ArrayData, Int) => Long = t match {
    case ByteType => (a, i) => a.getByte(i).toLong
    case ShortType => (a, i) => a.getShort(i).toLong
    case IntegerType => (a, i) => a.getInt(i).toLong
    case _ => (a, i) => a.getLong(i)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val ga = getter(elemType(left))
    val gb = getter(elemType(right))
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += ga(a, i) * gb(b, i)
      i += 1
    }
    acc
  }

  private def genGet(t: DataType, arr: String, i: String): String = t match {
    case ByteType => s"(long) $arr.getByte($i)"
    case ShortType => s"(long) $arr.getShort($i)"
    case IntegerType => s"(long) $arr.getInt($i)"
    case _ => s"$arr.getLong($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      s"""
        final int $n = $l.numElements();
        if ($n != $r.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $acc = 0L;
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
            $acc += (${genGet(elemType(left), l, i)}) * (${genGet(elemType(right), r, i)});
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotInt =
    copy(left = newLeft, right = newRight)
}
