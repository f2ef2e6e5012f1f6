package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** [[ArrayDot]] replaced the HOF composition in the vector family's hot
  * paths, so its contract is BIT-identity with that composition: same
  * left-to-right sequential fold, same per-element float→double casts,
  * same null semantics. Any drift would break oracle parity for every
  * cosine-based query at once. */
class ArrayDotSpec extends SparkSpec {

  private val HofDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  /** Deterministic pseudo-random floats incl. negatives and magnitudes
    * spanning ~1e-3..1e3 — enough dynamic range that a fold-order change
    * WOULD move the last ulp (what this spec exists to catch). */
  private def vec(seed: Int, n: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)((rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(7) - 3).toFloat)
  }

  test("bit-identical to the HOF fold on float arrays (codegen path)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map(i => (vec(i, 64), vec(i + 1000, 64)))
    val out = rows.toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("native"), expr(HofDot).as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("double and mixed float/double element types agree with the HOF") {
    val s = spark
    import s.implicits._
    val rows = (0 until 50).map { i =>
      (vec(i, 16), vec(i + 500, 16).map(_.toDouble))
    }
    val out = rows.toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("native"), expr(HofDot).as("hof"),
        expr("graft_dot(b, b)").as("dd"),
        expr("aggregate(zip_with(b, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), " +
          "(acc, v) -> acc + v)").as("ddHof"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("null semantics mirror the HOF: null array/element and length mismatch") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),   // 11.0
      (2L, None: Option[Seq[Float]], Some(Seq(1.0f))),      // null array
      (3L, Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f))),         // length mismatch
      (4L, Some(Seq.empty[Float]), Some(Seq.empty[Float]))  // empty -> 0.0
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), expr("graft_dot(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L) === Some(11.0))
    assert(out(2L) === None)
    assert(out(3L) === None)
    assert(out(4L) === Some(0.0))
    // null ELEMENT nulls the product chain in the HOF; ArrayDot must too
    val withNullElem = s.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d")
    assert(withNullElem.head().isNullAt(0))
  }

  test("ARRAY<NULL> literals are accepted for HOF parity (empty→0.0, null elem→NULL)") {
    val s = spark
    // a bare array() literal types as ARRAY<NULL>; the HOF composition
    // accepted it (empty fold = 0.0), so graft_dot must too
    assert(s.sql("SELECT graft_dot(array(), array()) AS d").head().getDouble(0) === 0.0)
    // a non-empty NullType array has only null elements → NULL, like the HOF
    assert(s.sql("SELECT graft_dot(array(null), array(CAST(1.0 AS FLOAT))) AS d")
      .head().isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path") {
    val s = spark
    import s.implicits._
    val a = vec(7, 64)
    val b = vec(8, 64)
    val interp = ArrayDot(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(FloatType))).eval(null).asInstanceOf[Double]
    val codegen = Seq((a, b)).toDF("a", "b")
      .select(expr("graft_dot(a, b)")).head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(interp) ===
      java.lang.Double.doubleToRawLongBits(codegen))
  }
}
