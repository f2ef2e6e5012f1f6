package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q212 farthest-point seed selection — the oracle checks values; this
  * checks the algorithm: the distributed unrolling must equal the
  * textbook sequential greedy, and the max-min radius must be
  * non-increasing (the k-center greedy invariant). */
class KCenterSpec extends SparkSpec {

  test("q212: equals sequential greedy k-center; selection radius non-increasing") {
    val out = graft.SparkEntry.queries("q212_kcenter_seeds")(spark, sf001)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    assert(out.length == 5 && out.head._3.isEmpty)
    // radius shrinks (or stays) as the chosen set grows
    out.flatMap(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-12, s"max-min distance grew: $a -> $b")
      case _ => ()
    }
    // sequential greedy recompute in plain Scala with the same 9dp cosine
    val vecs = graft.schema.Tables.t(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var chosen = List(vecs.head._1)
    var expect = List((1L, vecs.head._1, Option.empty[Double]))
    for (k <- 2 to 5) {
      val cand = vecs.filterNot(v => chosen.contains(v._1)).map { case (id, e) =>
        val md = chosen.map(c => 1.0 - r9(cos(e, vecs.find(_._1 == c).get._2))).min
        (md, -id, id)
      }
      val w = cand.max
      chosen ::= w._3
      expect ::= ((k.toLong, w._3, Some(w._1)))
    }
    assert(out.toList == expect.reverse,
      s"distributed ${out.toList} != sequential ${expect.reverse}")
  }
}
