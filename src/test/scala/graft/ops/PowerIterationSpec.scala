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

  test("powerIterate recovers a planted dominant direction on synthetic data") {
    val s = spark
    import s.implicits._
    // vectors sampled along axis 7 with amplitude ±10 plus axis 23 with
    // amplitude ±1 (deterministic alternating signs): X'X's top
    // eigenvector is e7 by two orders of magnitude in variance
    val vecs = (0 until 200).map { i =>
      val a = Array.fill(64)(0.0f)
      a(7) = (if (i % 2 == 0) 10f else -10f) + (i % 5) * 0.01f
      a(23) = if (i % 3 == 0) 1f else -1f
      (i.toLong, a)
    }.toDF("vec_id", "embedding")
    val v = VectorSearch.powerIterate(vecs, rounds = 3)
      .orderBy("pos").collect().map(_.getDouble(1))
    // embedding index 7 = pos 8 = collected row 7 (rows ordered by pos)
    assert(math.abs(v(7)) > 0.99,
      s"loading on the planted axis should dominate: ${v.toSeq}")
    val offAxis = v.zipWithIndex.collect { case (x, i) if i != 7 => math.abs(x) }.max
    assert(offAxis < 0.1, s"off-axis mass too large: $offAxis")
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

  test("q146: three mutually-orthogonal unit loadings with descending Rayleigh") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val rows = SparkEntry.queries("q146_power_top3")(spark, sf001)
      .orderBy("pos").collect()
    assert(rows.length == 64)
    val l1 = rows.map(_.getDouble(1))
    val l2 = rows.map(_.getDouble(2))
    val l3 = rows.map(_.getDouble(3))
    // loading1/loading2 are exactly q125/q126's chains (registry-shared)
    assert(l1.toSeq == pc1.toSeq && l2.toSeq == pc2.toSeq)
    assert(math.abs(math.sqrt(dot(l3, l3)) - 1.0) < 1e-4)
    // double deflation keeps t ⊥ v and t ⊥ u up to the 9dp re-entry
    // rounding. (No Rayleigh-ORDER assertion between u and t here: the
    // real corpus tail spectrum is near-flat, and 3 rounds cannot
    // separate near-equal eigenvalues — the planted test below owns the
    // ordering property on a corpus where it's actually true.)
    assert(math.abs(dot(l1, l3)) < 1e-3)
    assert(math.abs(dot(l2, l3)) < 1e-3)
  }

  test("double deflation recovers a planted THIRD axis on a separated spectrum") {
    val s = spark
    import s.implicits._
    // amplitudes 10 / 3 / 1 on axes 7 / 23 / 41: an unambiguous spectrum
    val vecs = (0 until 240).map { i =>
      val a = Array.fill(64)(0.0f)
      a(7) = (if (i % 2 == 0) 10f else -10f) + (i % 5) * 0.01f
      a(23) = (if (i % 3 == 0) 3f else -3f) + (i % 7) * 0.005f
      a(41) = if (i % 5 == 0) 1f else -1f
      (i.toLong, a)
    }.toDF("vec_id", "embedding")
    val d1 = VectorSearch.powerIterate(vecs, rounds = 3)
    val d2 = VectorSearch.powerIterateDeflated(vecs, rounds = 3, Seq(d1))
    val d3 = VectorSearch.powerIterateDeflated(vecs, rounds = 3, Seq(d1, d2))
    def loadings(df: org.apache.spark.sql.DataFrame): Array[Double] =
      df.orderBy("pos").collect().map(_.getDouble(1))
    val (v1, v2, v3) = (loadings(d1), loadings(d2), loadings(d3))
    assert(math.abs(v1(7)) > 0.99, s"chain 1 should land on axis 7: ${v1.toSeq}")
    assert(math.abs(v2(23)) > 0.99, s"chain 2 should land on axis 23: ${v2.toSeq}")
    assert(math.abs(v3(41)) > 0.99, s"chain 3 should land on axis 41: ${v3.toSeq}")
  }
}
