package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent-reference checks for the round-12 kernels, beyond their
  * DuckDB oracles (the Round10/Round11OpsSpec discipline): the oracle
  * pins cross-ENGINE agreement, these pin agreement with a second,
  * structurally different implementation — driver-side sequential Scala
  * over the collected corpus, no Spark plans and no SQL. */
class Round12OpsSpec extends SparkSpec {

  test("q296 residual-IVF-PQ recall audit matches a first-principles reference") {
    val rows = graft.schema.Tables.t(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getAs[Number](2).intValue))
      .sortBy(_._1)
    val byId = rows.map(v => v._1 -> v._2).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val (m, k, nprobe) = (8, 64, 2)
    val sub = 64 / m
    // coarse table: per-label centroids with 6dp components
    val cents = rows.groupBy(_._3).map { case (l, vs) =>
      l -> Array.tabulate(64)(i => r6(vs.map(_._2(i)).sum / vs.size))
    }
    // residual codebook: residuals of vec_id < k
    val rcb = rows.takeWhile(_._1 < k)
      .map(v => v._2.indices.map(i => v._2(i) - cents(v._3)(i)).toArray)
    def subDist(v: Array[Double], c: Array[Double], j: Int) =
      (0 until sub).map { d =>
        val i = j * sub + d; (v(i) - c(i)) * (v(i) - c(i))
      }.sum
    val expected = (100L until 108L).map { qid =>
      val q = byId(qid)
      val probed = cents.toSeq
        .sortBy { case (l, c) => (r9(l2(c, q)), l) }
        .take(nprobe).map(_._1).toSet
      // per-(list, code) LUT over the probed lists' query residuals
      val lut = cents.filter(p => probed(p._1)).map { case (l, c) =>
        val qr = q.indices.map(i => q(i) - c(i)).toArray
        l -> Array.tabulate(m, rcb.size)((j, cc) => r9(subDist(qr, rcb(cc), j)))
      }
      val cands = rows.filter(v => v._1 != qid && probed(v._3))
      val top20 = cands.map { v =>
        val rv = v._2.indices.map(i => v._2(i) - cents(v._3)(i)).toArray
        val cs = Array.tabulate(m)(j =>
          rcb.indices.minBy(c => (subDist(rv, rcb(c), j), c)))
        (v._1, r6((0 until m).map(j => lut(v._3)(j)(cs(j))).sum))
      }.sortBy { case (id, adc) => (adc, id) }.take(20)
      val fun5 = top20.map { case (id, _) => (id, r6(l2(byId(id), q))) }
        .sortBy { case (id, t) => (t, id) }.take(5).map(_._1).toSet
      val exact5 = rows.filter(_._1 != qid)
        .map(v => (v._1, r6(l2(v._2, q))))
        .sortBy { case (id, t) => (t, id) }.take(5).map(_._1).toSet
      qid -> r6((fun5 & exact5).size / 5.0)
    }
    val got = graft.SparkEntry.queries("q296_ivfpq_recall_audit")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    expected.foreach { case (qid, rec) =>
      assert(got(qid) == rec, s"qid $qid: engine ${got(qid)} != reference $rec")
    }
    val avg = r6(expected.map(_._2).sum / expected.size)
    assert(got(-1L) == avg, s"ALL row ${got(-1L)} != reference $avg")
  }
}
