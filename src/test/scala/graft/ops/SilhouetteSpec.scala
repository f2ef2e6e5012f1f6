package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q256: the centroid silhouette must equal a sequential textbook pass
  * (per-vector top-2 seed cosines → (b−a)/max(a,b) → per-cluster means)
  * and respect the statistic's bounds. */
class SilhouetteSpec extends SparkSpec {

  test("q256 equals a sequential per-vector recompute; values bounded") {
    def rnd(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val vecs = graft.schema.Tables.t(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val seeds = vecs.filter(_._1 < 5).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val per = scala.collection.mutable.Map.empty[Long, (Long, BigDecimal)]
    vecs.foreach { case (_, e) =>
      val scored = seeds.map { case (sid, se) => (rnd(cos(e, se), 9).toDouble, sid) }
        .sortBy { case (c, sid) => (-c, sid) }
      val (c1, sid) = scored(0); val (c2, _) = scored(1)
      val s = if (math.max(1 - c1, 1 - c2) == 0) 0.0
        else (c1 - c2) / math.max(1 - c1, 1 - c2)
      val (n, ss) = per.getOrElse(sid, (0L, BigDecimal(0)))
      per(sid) = (n + 1, ss + rnd(s, 9))
    }
    val expected = per.map { case (sid, (n, ss)) =>
      sid -> ((n, rnd(ss.toDouble / n, 6).toDouble))
    }
    val got = graft.SparkEntry.queries("q256_silhouette")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size === expected.size + 1) // + the ALL row
    expected.foreach { case (sid, v) => assert(got(sid) === v, s"seed $sid") }
    // ALL row aggregates the same mass
    val (nAll, _) = got(-1L)
    assert(nAll === vecs.length.toLong)
    got.values.foreach { case (_, m) => assert(m >= -1.0 && m <= 1.0) }
    // a seed vector is its own nearest centroid at distance 0 → its
    // cluster exists and the statistic discriminates across clusters
    assert(got.size >= 3 && got.values.map(_._2).toSet.size > 1)
  }
}
