package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Matvec buffer: per-position exact scale-12 sums; `sums == null` until
  * the first contributing row (so an empty group yields NULL per
  * position, like 64 separate `sum()`s would). */
final class MatvecBuf(var sums: Array[JBigDecimal]) extends Serializable

/** The power-iteration round's whole matvec w = X'(Xv) as ONE native
  * imperative aggregate: per input row compute d = x·v (the exact-
  * decimal dot, [[ArrayDotDec]] semantics against the round's direction
  * literal), then add cast(d·x_p AS DECIMAL(38,12)) into position p's
  * exact running sum. Output: the 64 position sums as ARRAY<DOUBLE>
  * (each the decimal sum cast to double — `decSum` semantics).
  *
  * Why an aggregate and not 64 column aggregates: the previous shape —
  * a 64-column HashAggregate of `sum(CAST(d * element_at(embedding, p)
  * AS DECIMAL(38,12)))` — was correct but paid three structural taxes
  * per round (VERDICT r9 item 6): the analyzer/optimizer walks 64 big
  * expression trees (~0.5 s driver per round), the 64 decimal buffers
  * overflow `spark.sql.codegen.maxFields` so the stage abandons
  * whole-stage codegen and evaluates interpreted, and the generated/
  * interpreted update allocates a Decimal per (row × position). This
  * expression is a tight two-level loop with ONE aggregate column:
  * driver plan is tiny, partial state is one 64-entry array per
  * partition (the minimum possible shuffle), and the decimal math runs
  * compiled Scala.
  *
  * Decimal parity is bit-exact with the composition it replaces (pinned
  * in DecMatvecSpec): d accumulates per-product
  * `BigDecimal.valueOf(x·v).setScale(12, HALF_UP)` — Spark's double→
  * DECIMAL(28,12) `Cast` — and converts via `doubleValue` (Decimal
  * .toDouble); each w_p term is `valueOf(d·x_p).setScale(12, HALF_UP)`
  * (the double→DECIMAL(38,12) cast) added exactly at scale 12.
  *
  * Row handling mirrors the old shape: a NULL embedding, a NULL element,
  * or a length mismatch against the direction made d NULL there, nulling
  * every product of the row — i.e. the row contributed nothing. Here it
  * is skipped outright. */
case class DecMatvec(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MatvecBuf] with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_matvec_dec"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == FloatType || lt == DoubleType) && rt == DoubleType =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_matvec_dec: the direction must be a foldable array literal")
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_matvec_dec requires (ARRAY<FLOAT|DOUBLE>, ARRAY<DOUBLE>) inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  @transient private lazy val vArr: Array[Double] = {
    val d = right.eval(InternalRow.empty)
    require(d != null, "graft_matvec_dec: direction literal is null")
    d.asInstanceOf[ArrayData].toDoubleArray()
  }
  @transient private lazy val leftIsFloat = elemType(left) == FloatType

  override def createAggregationBuffer(): MatvecBuf = new MatvecBuf(null)

  override def update(b: MatvecBuf, input: InternalRow): MatvecBuf = {
    val raw = left.eval(input)
    if (raw == null) return b
    val a = raw.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != vArr.length) return b
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return b
      xs(i) = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    // d = x·v — ArrayDotDec semantics: per-product double→DEC(28,12)
    // HALF_UP cast, exact scale-12 accumulation, Decimal.toDouble out
    var acc = JBigDecimal.ZERO.setScale(12)
    i = 0
    while (i < n) {
      acc = acc.add(
        JBigDecimal.valueOf(xs(i) * vArr(i)).setScale(12, RoundingMode.HALF_UP))
      i += 1
    }
    val d = acc.doubleValue
    if (b.sums == null) {
      b.sums = Array.fill(n)(JBigDecimal.ZERO.setScale(12))
    }
    var p = 0
    while (p < n) {
      // cast(d * x_p AS DECIMAL(38,12)), added exactly (decSum parity)
      b.sums(p) = b.sums(p).add(
        JBigDecimal.valueOf(d * xs(p)).setScale(12, RoundingMode.HALF_UP))
      p += 1
    }
    b
  }

  override def merge(a: MatvecBuf, b: MatvecBuf): MatvecBuf = {
    if (b.sums == null) return a
    if (a.sums == null) { a.sums = b.sums; return a }
    var p = 0
    while (p < a.sums.length) { a.sums(p) = a.sums(p).add(b.sums(p)); p += 1 }
    a
  }

  override def eval(b: MatvecBuf): Any =
    if (b.sums == null) null
    else new GenericArrayData(b.sums.map(_.doubleValue))

  override def serialize(b: MatvecBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(b.sums)
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MatvecBuf = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val sums = in.readObject().asInstanceOf[Array[JBigDecimal]]
    in.close()
    new MatvecBuf(sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DecMatvec =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecMatvec =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecMatvec =
    copy(left = newLeft, right = newRight)
}
