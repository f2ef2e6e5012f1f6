package graft.ops

import org.apache.spark.sql.functions._

/** q334 bitext mining: a sequential JVM pass reproduces every best
  * pair, margin, and mutuality flag; plus the definitional invariants. */
class BitextMiningSpec extends graft.SparkSpec {

  test("best pair, margin, and mutuality match a sequential recomputation") {
    val s = spark
    import s.implicits._
    val emb = graft.schema.Tables.t(s, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val xs = emb.filter(_._1 % 2 == 0).sortBy(_._1)
    val ys = emb.filter(_._1 % 2 == 1).sortBy(_._1)
    def r(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      r(d / (math.sqrt(na) * math.sqrt(nb)), 9)
    }
    // full pair matrix at 9dp, exactly like the engines
    val m = xs.map(x => ys.map(y => cos(x._2, y._2)))
    def topMean(row: Seq[Double]) = row.sorted.reverse.take(4).sum / 4
    val kx = m.map(row => topMean(row.toSeq))
    val ky = ys.indices.map(j => topMean(xs.indices.map(i => m(i)(j))))
    // per x: best y (cos desc, ty asc); per y: best x
    val bestY = xs.indices.map(i => ys.indices.minBy(j => (-m(i)(j), ys(j)._1)))
    val bestX = ys.indices.map(j => xs.indices.minBy(i => (-m(i)(j), xs(i)._1)))

    val q = graft.SparkEntry.queries("q334_bitext_mining")(s, sf001)
      .collect().map(row => row.getLong(0) ->
        (row.getLong(1), row.getDouble(2), row.getDouble(3), row.getBoolean(4)))
      .toMap
    xs.indices.foreach { i =>
      val j = bestY(i)
      val (ty, cs, mg, mu) = q(xs(i)._1)
      assert(ty === ys(j)._1, s"src ${xs(i)._1} best target")
      assert(cs === r(m(i)(j), 6), s"src ${xs(i)._1} cos")
      assert(mg === r(m(i)(j) / ((kx(i) + ky(j)) / 2), 6), s"src ${xs(i)._1} margin")
      assert(mu === (bestX(j) == i), s"src ${xs(i)._1} mutuality")
    }
  }

  test("definitional invariants: one row per source, cos bounded, margins positive") {
    val rows = graft.SparkEntry.queries("q334_bitext_mining")(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getDouble(2) <= 1.000001 && r.getDouble(2) >= -1.000001)
      assert(r.getDouble(3) > 0.0)
    }
    // the mutual subset is a partial matching: no target repeats in it
    val mutualTargets = rows.filter(_.getBoolean(4)).map(_.getLong(1))
    assert(mutualTargets.distinct.length === mutualTargets.length)
  }
}
