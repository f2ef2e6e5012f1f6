package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** [[ArrayDotInt]] replaced the interpreted HOF in q139's quantized-ANN
  * scoring loop. Integer addition is exact and associative, so the
  * contract is plain equality with the HOF composition — plus the same
  * null semantics as [[ArrayDot]] (null array/element and length mismatch
  * all → NULL). */
class ArrayDotIntSpec extends SparkSpec {

  private val HofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  /** Deterministic pseudo-random int8-range values (the q139 regime) with
    * a few large outliers to exercise 64-bit accumulation. */
  private def vec(seed: Int, n: Int): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n) {
      if (rnd.nextInt(20) == 0) rnd.nextInt(1 << 20).toLong - (1 << 19)
      else rnd.nextInt(255).toLong - 127
    }
  }

  test("equals the HOF fold on bigint arrays (codegen path)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map(i => (vec(i, 64), vec(i + 1000, 64)))
    val out = rows.toDF("a", "b")
      .select(expr("graft_dot_int(a, b)").as("native"), expr(HofDot).as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("int and mixed int/bigint element types agree with the HOF") {
    val s = spark
    import s.implicits._
    val rows = (0 until 50).map(i => (vec(i, 16).map(_.toInt), vec(i + 500, 16)))
    val out = rows.toDF("a", "b")
      .select(expr("graft_dot_int(a, b)").as("native"), expr(HofDot).as("hof"),
        expr("graft_dot_int(a, a)").as("ii"),
        expr("aggregate(zip_with(a, a, (x, y) -> CAST(x AS BIGINT) * y), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("iiHof"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("null semantics mirror the HOF: null array/element, length mismatch, empty") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq(2L, 3L)), Some(Seq(4L, 5L))),      // 23
      (2L, None: Option[Seq[Long]], Some(Seq(1L))),    // null array
      (3L, Some(Seq(1L, 2L)), Some(Seq(1L))),          // length mismatch
      (4L, Some(Seq.empty[Long]), Some(Seq.empty[Long])) // empty -> 0
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), expr("graft_dot_int(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L) === Some(23L))
    assert(out(2L) === None)
    assert(out(3L) === None)
    assert(out(4L) === Some(0L))
    assert(s.sql("SELECT graft_dot_int(array(1L, NULL), array(1L, 2L)) AS d")
      .head().isNullAt(0))
    // bare array() literals (ARRAY<NULL>) accepted, as in graft_dot
    assert(s.sql("SELECT graft_dot_int(array(), array()) AS d").head().getLong(0) === 0L)
  }

  test("interpreted eval agrees with the codegen path") {
    val s = spark
    import s.implicits._
    val a = vec(7, 64)
    val b = vec(8, 64)
    val interp = ArrayDotInt(
      Literal.create(a, ArrayType(LongType)),
      Literal.create(b, ArrayType(LongType))).eval(null).asInstanceOf[Long]
    val codegen = Seq((a, b)).toDF("a", "b")
      .select(expr("graft_dot_int(a, b)")).head().getLong(0)
    assert(interp === codegen)
  }
}
