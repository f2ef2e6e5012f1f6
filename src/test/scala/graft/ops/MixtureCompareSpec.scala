package graft.ops

import org.apache.spark.sql.functions._

/** q346 mixture-law comparison: each weight column must equal its
  * component law recomputed independently — DoReMi against q336's own
  * verified output, temperature and UniMax against sequential
  * references — and each law must be a probability vector. */
class MixtureCompareSpec extends graft.SparkSpec {

  test("component laws agree with their sources; weights sum to one") {
    val s = spark
    import s.implicits._
    val q = graft.SparkEntry.queries("q346_mixture_compare")(s, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap

    // DoReMi column == q336's averaged mixture
    val doremi = graft.SparkEntry.queries("q336_doremi_iterate")(s, sf001)
      .select(col("source"), col("wbar")).as[(String, Double)].collect().toMap
    assert(q.keySet === doremi.keySet)
    q.foreach { case (src, v) => assert(v._3 === doremi(src), s"$src doremi") }

    // temperature: decimal-quantized sqrt(tokens) over its exact sum
    val toks = q.view.mapValues(_._1).toMap
    def d9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val z = toks.values.map(t => d9(math.sqrt(t.toDouble))).sum
    q.foreach { case (src, v) =>
      val w = BigDecimal(d9(math.sqrt(toks(src).toDouble)).toDouble / z.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(v._2 === w, s"$src temp")
    }

    // UniMax: the q340 sequential walk over source token counts
    val langs = toks.toSeq.sortBy { case (l, n) => (n, l) }
    val budget = 3L * langs.map(_._2).sum / 2L
    var remaining = budget.toDouble
    val uni = langs.zipWithIndex.map { case ((src, n), i) =>
      val share = remaining / (langs.length - i)
      val alloc = if (2L * n <= share) (2L * n).toDouble else share
      remaining -= alloc
      src -> BigDecimal(math.round(alloc).toDouble / budget)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    q.foreach { case (src, v) => assert(v._4 === uni(src), s"$src unimax") }

    // probability vectors (up to 6-dp rounding) and spread consistency
    Seq(q.values.map(_._2), q.values.map(_._3), q.values.map(_._4)).foreach {
      ws => assert(math.abs(ws.sum - 1.0) < 1e-3, ws.sum.toString)
    }
    q.foreach { case (src, v) =>
      val ws = Seq(v._2, v._3, v._4)
      val sp = BigDecimal(ws.max - ws.min)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(v._5 === sp, s"$src spread")
    }
  }
}
