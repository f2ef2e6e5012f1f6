package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact-decimal dot product over (ARRAY<FLOAT|DOUBLE>, ARRAY<DOUBLE>)
  * as a native Catalyst expression — the power-iteration family's hot
  * inner loop (q125/q126/q146: per-vector d = x·v against the round's
  * direction literal).
  *
  * Replaces the higher-order composition
  * `aggregate(zip_with(x, v, (a, b) -> CAST(CAST(a AS DOUBLE) * b AS
  * DECIMAL(28,12))), CAST(0 AS DECIMAL(28,12)), (acc, y) -> CAST(acc +
  * y AS DECIMAL(28,12)))`, which evaluates interpreted (lambda closures
  * per element, a fresh Decimal allocation per add, no codegen) inside
  * an otherwise codegen'd aggregate stage — measured as the dominant
  * per-task cost of every power round.
  *
  * Decimal parity is load-bearing (the DuckDB oracle recomputes the same
  * chain in DECIMAL(38,12), and the engine's result must hash-match):
  * per element the product double casts to DECIMAL(28,12) exactly as
  * Spark's `Cast` does — `java.math.BigDecimal.valueOf(p)` (the
  * Double.toString path scala's `BigDecimal.decimal` wraps) then
  * `setScale(12, HALF_UP)` — and the accumulation is plain BigDecimal
  * addition at scale 12, exact like the HOF's step-wise
  * DECIMAL(29,12)→(28,12) casts (which can't lose digits below 10^16).
  * ArrayDotDecSpec asserts bit-equality against the HOF twin element-
  * wise on randomized inputs.
  *
  * Null semantics mirror the HOF: null array → null; length mismatch →
  * null (zip_with pads with null, nulling the sum); null element →
  * null; two empty arrays → 0.000000000000. */
case class ArrayDotDec(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DecimalType(28, 12)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_dec"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == FloatType || lt == DoubleType || lt == NullType) &&
            (rt == DoubleType || rt == NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_dot_dec requires (ARRAY<FLOAT|DOUBLE>, ARRAY<DOUBLE>) inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val aFloat = elemType(left) == FloatType
    var acc = JBigDecimal.ZERO.setScale(12)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val p = x * b.getDouble(i)
      acc = acc.add(JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP))
      i += 1
    }
    Decimal(acc, 28, 12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val bad = ctx.freshName("bad")
      s"""
        final int $n = $l.numElements();
        if ($n != $r.numElements()) {
          ${ev.isNull} = true;
        } else {
          java.math.BigDecimal $acc = java.math.BigDecimal.ZERO.setScale(12);
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
            final double $p = ((double) $l.$lGet($i)) * $r.getDouble($i);
            $acc = $acc.add(java.math.BigDecimal.valueOf($p)
              .setScale(12, java.math.RoundingMode.HALF_UP));
          }
          if ($bad) { ${ev.isNull} = true; }
          else { ${ev.value} =
            org.apache.spark.sql.types.Decimal.apply($acc, 28, 12); }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotDec =
    copy(left = newLeft, right = newRight)
}
