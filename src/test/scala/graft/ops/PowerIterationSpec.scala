package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Mathematical invariants of the power-iteration family (q125/q126) that
  * the DuckDB oracle's hash compare cannot express: the returned loadings
  * are unit vectors, the deflated direction is orthogonal to the top one,
  * and the top direction actually dominates (its Rayleigh quotient on the
  * corpus covariance-ish operator X'X exceeds the runner-up's). */
class PowerIterationSpec extends SparkSpec {

  private lazy val pc1: Array[Double] =
    SparkEntry.queries("q125_power_iteration")(spark, sf001)
      .orderBy("pos").collect().map(_.getDouble(1))

  private lazy val pc2: Array[Double] =
    SparkEntry.queries("q126_power_deflation")(spark, sf001)
      .orderBy("pos").collect().map(_.getDouble(1))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("q125 loading is a 64-dim unit vector") {
    assert(pc1.length == 64)
    assert(math.abs(math.sqrt(dot(pc1, pc1)) - 1.0) < 1e-4)
  }

  test("q126 loading is a 64-dim unit vector") {
    assert(pc2.length == 64)
    assert(math.abs(math.sqrt(dot(pc2, pc2)) - 1.0) < 1e-4)
  }

  test("q126 direction is orthogonal to q125's (Gram-Schmidt deflation)") {
    // per-round deflation keeps u ⊥ v up to the 9dp re-entry rounding
    assert(math.abs(dot(pc1, pc2)) < 1e-3)
  }

  test("q125 dominates q126 in Rayleigh quotient over X'X") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.schema.Tables.t(spark, sf001, "embeddings")
    // Σ_rows (x·v)² = v'X'Xv for unit v
    def ray(v: Array[Double]): Double = {
      val vl = array(v.toIndexedSeq.map(lit): _*)
      emb.withColumn("__v", vl)
        .select(expr("graft_dot(transform(embedding, x -> CAST(x AS DOUBLE)), __v)").as("d"))
        .agg(sum(col("d") * col("d"))).head().getDouble(0)
    }
    val r1 = ray(pc1)
    val r2 = ray(pc2)
    assert(r1 > r2, s"top PC Rayleigh $r1 should exceed runner-up $r2")
  }
}
