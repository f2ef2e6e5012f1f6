package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Sequential-fold dot product over two FLOAT/DOUBLE array columns as a
  * native Catalyst expression with codegen.
  *
  * The vector family's hot inner loop (cosine in q44/q110/q113/q120, the
  * JL projection, the k-means assignment argmax) was previously the
  * higher-order-function composition
  * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)), 0.0, (acc, v) -> acc + v)` — semantically right, but HOFs
  * evaluate interpreted (lambda closures per element, boxed accumulators,
  * no whole-stage codegen), which puts microseconds on every 64-dim dot
  * and dominates the dense O(N·k) assignment pass at scale. This
  * expression generates the straight-line loop instead.
  *
  * Float parity is load-bearing: the fold is the SAME left-to-right
  * sequential sum over the SAME per-element float→double casts, so every
  * double it produces is bit-identical to the HOF twin's (asserted
  * element-wise in ArrayDotSpec) and the DuckDB oracle SQL — which spells
  * out the identical list_sum/list_transform order — is untouched.
  * Null semantics mirror the HOF composition: null array → null; a null
  * element → null; length mismatch → null (zip_with pads the short side
  * with null, which nulls the HOF sum). */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  // NullType element types (a bare array() / array(null) literal from
  // ad-hoc SQL) are accepted for parity with the HOF composition this
  // expression replaced: every NullType element is null, so the null-
  // element short-circuit yields NULL, and two empty arrays yield 0.0 —
  // the element getters are never reached.
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType || t == NullType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_dot requires two ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
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
          double $acc = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
            $acc += ((double) $l.$lGet($i)) * ((double) $r.$rGet($i));
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
