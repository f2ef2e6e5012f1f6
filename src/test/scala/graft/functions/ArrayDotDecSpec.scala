package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graft_dot_dec must be BIT-equal to the higher-order composition it
  * replaced in the power loops — same per-product double→DECIMAL(28,12)
  * HALF_UP cast, same exact accumulation — or q125/q126/q146/q132 drift
  * from their DuckDB oracles. */
class ArrayDotDecSpec extends SparkSpec {

  private def hofDot(a: String, b: String) = expr(
    s"""CAST(aggregate(
       |  zip_with($a, $b, (x, vv) -> CAST(CAST(x AS DOUBLE) * vv AS DECIMAL(28,12))),
       |  CAST(0 AS DECIMAL(28,12)),
       |  (acc, y) -> CAST(acc + y AS DECIMAL(28,12))) AS DECIMAL(28,12))""".stripMargin)

  test("bit-equal to the HOF decimal fold on randomized float vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      val dim = 64
      (i.toLong,
        Array.fill(dim)((rnd.nextFloat() - 0.5f) * 10f),
        Array.fill(dim)((rnd.nextDouble() - 0.5) * 2))
    }
    val df = rows.toDF("id", "emb", "v")
    val cmp = df.select(col("id"),
      GraftFunctions.graft_dot_dec(col("emb"), col("v")).as("native"),
      hofDot("emb", "v").as("hof"))
    val bad = cmp.filter(not(col("native") <=> col("hof"))).count()
    assert(bad == 0, s"$bad rows diverge from the HOF fold")
    // and through SQL text (extension-injected)
    df.createOrReplaceTempView("dotdec_in")
    val sqlBad = s.sql(
      """SELECT count(*) AS n FROM dotdec_in
        |WHERE NOT (graft_dot_dec(emb, v) <=> CAST(aggregate(
        |  zip_with(emb, v, (x, vv) -> CAST(CAST(x AS DOUBLE) * vv AS DECIMAL(28,12))),
        |  CAST(0 AS DECIMAL(28,12)),
        |  (acc, y) -> CAST(acc + y AS DECIMAL(28,12))) AS DECIMAL(28,12)))""".stripMargin)
      .head().getLong(0)
    assert(sqlBad == 0)
  }

  test("null semantics mirror the HOF: null array, null element, length mismatch") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(0.5, 0.25)),         // plain
      (2L, Array.empty[Float], Array.empty[Double])       // empty → 0
    ).toDF("id", "emb", "v")
    val got = df.select(col("id"),
      GraftFunctions.graft_dot_dec(col("emb"), col("v")).cast("string").as("d"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "1.000000000000"), (2L, "0.000000000000")))
    // null array / null element / mismatched length → null, like the HOF
    val edge = s.sql(
      """SELECT
        |  graft_dot_dec(CAST(NULL AS ARRAY<FLOAT>), array(1.0D)) AS a,
        |  graft_dot_dec(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                array(1.0D, 2.0D)) AS b,
        |  graft_dot_dec(array(CAST(1.0 AS FLOAT)), array(1.0D, 2.0D)) AS c""".stripMargin)
      .head()
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
  }
}
