package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graft_matvec_dec must be BIT-equal to the 64-column decimal-sum
  * aggregate shape it replaced in the power loops, or q125/q126/q146/
  * q132 drift from their DuckDB oracles. The reference shape here is
  * spelled out with the same HOF dot + per-position
  * sum(CAST(d·x_p AS DECIMAL(38,12))) casts the old plan used. */
class DecMatvecSpec extends SparkSpec {

  private val dim = 8

  private def referenceShape(view: String): Seq[Double] = {
    val s = spark
    val dot =
      s"""CAST(CAST(aggregate(
         |  zip_with(emb, v, (x, vv) -> CAST(CAST(x AS DOUBLE) * vv AS DECIMAL(28,12))),
         |  CAST(0 AS DECIMAL(28,12)),
         |  (acc, y) -> CAST(acc + y AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS DOUBLE)"""
        .stripMargin
    val sums = (1 to dim).map(p =>
      s"CAST(sum(CAST(d * CAST(element_at(emb, $p) AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS w$p")
    s.sql(s"SELECT ${sums.mkString(", ")} FROM (SELECT emb, $dot AS d FROM $view)")
      .head().toSeq.map(_.asInstanceOf[Double])
  }

  test("bit-equal to the 64-column decimal aggregate on randomized floats") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val v = Array.fill(dim)((rnd.nextDouble() - 0.5) * 2)
    val rows = (1 to 500).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 10f), v)
    }
    val df = rows.toDF("id", "emb", "v").repartition(3) // exercise merge
    df.createOrReplaceTempView("matvec_in")
    val native = df
      .agg(GraftFunctions.graft_matvec_dec(col("emb"), typedLit(v.toSeq)).as("w"))
      .head().getSeq[Double](0)
    val ref = referenceShape("matvec_in")
    assert(native.size == dim)
    (0 until dim).foreach { p =>
      assert(java.lang.Double.doubleToLongBits(native(p)) ==
        java.lang.Double.doubleToLongBits(ref(p)),
        s"position $p diverges: native=${native(p)} reference=${ref(p)}")
    }
  }

  test("rows the old shape nulled out contribute nothing; empty group is NULL") {
    val s = spark
    import s.implicits._
    val v = Seq(1.0, 2.0)
    val good = (1L, Array(1.0f, 1.0f))
    val shortRow = (2L, Array(1.0f))          // length mismatch → skipped
    val df = Seq(good, shortRow).toDF("id", "emb")
    val got = df.agg(
      GraftFunctions.graft_matvec_dec(col("emb"), typedLit(v)).as("w"))
      .head().getSeq[Double](0)
    // only the good row: d = 1*1 + 1*2 = 3; w = (3*1, 3*1)
    assert(got == Seq(3.0, 3.0))
    val empty = df.filter(col("id") > 10).agg(
      GraftFunctions.graft_matvec_dec(col("emb"), typedLit(v)).as("w"))
      .head()
    assert(empty.isNullAt(0), "empty group must be NULL like sum() is")
  }

  test("non-foldable direction is rejected") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(1.0f), Array(1.0))).toDF("id", "emb", "v")
    val e = intercept[Exception] {
      df.agg(GraftFunctions.graft_matvec_dec(col("emb"), col("v"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"))
  }
}
