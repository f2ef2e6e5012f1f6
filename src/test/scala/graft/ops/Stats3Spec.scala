package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 stats batch: the quantile interpolation modes must equal a
  * sequential textbook pass over the sorted group, the skew audit must
  * equal brute force over the collected frequency map, and neither may
  * plan a single-partition window (the stitch discipline). */
class Stats3Spec extends SparkSpec {

  test("q247: all four modes equal brute force over the sorted group") {
    val got = graft.SparkEntry.queries("q247_quantile_modes")(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val groups = graft.schema.Tables.t(spark, sf001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getInt(3))))
      .groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._2).sortBy(identity).map(_._1) }
    assert(got.size === groups.size * 3)
    for ((g, vs) <- groups; p <- Seq(0.25, 0.5, 0.75)) {
      val n = vs.length
      def at(k: Long) = vs(k.toInt - 1) // 1-based
      val low = at(math.floor(p * (n - 1)).toLong + 1)
      val high = at(math.ceil(p * (n - 1)).toLong + 1)
      val hE = p * (n + 1)
      val kE = math.max(math.floor(hE).toLong, 1L)
      val exc = at(kE) + (hE - math.floor(hE)) * (at(math.min(kE + 1, n)) - at(kE))
      val hI = 1 + p * (n - 1)
      val kI = math.floor(hI).toLong
      val inc = at(kI) + (hI - math.floor(hI)) * (at(math.min(kI + 1, n)) - at(kI))
      assert(got((g, p)) === ((low, high, exc, inc)), s"group $g p $p")
    }
    // monotone in p per mode
    for ((g, _) <- groups; i <- 0 until 4) {
      val seq = Seq(0.25, 0.5, 0.75).map(p => got((g, p)).productElement(i)
        .asInstanceOf[Double])
      assert(seq === seq.sorted, s"mode $i not monotone for $g")
    }
  }

  test("q248: skew audit equals brute force over the frequency map") {
    val r = graft.SparkEntry.queries("q248_key_skew_audit")(spark, sf001)
      .collect().head
    val freqs = graft.schema.Tables.t(spark, sf001, "lineitem")
      .groupBy(col("l_partkey")).count()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(x => (x._2, x._1)).map(_._2)
    val nk = freqs.length.toLong
    val nr = freqs.sum
    def rnd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) === nk && r.getLong(1) === nr)
    assert(r.getDouble(2) === rnd6(freqs.max.toDouble / nr))
    assert(r.getDouble(3) === rnd6(freqs.takeRight(10).sum.toDouble / nr))
    assert(r.getLong(4) === freqs((math.ceil(0.5 * nk) - 1).toInt))
    assert(r.getLong(5) === freqs((math.ceil(0.99 * nk) - 1).toInt))
    val sRc = freqs.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    val gini = (2.0 * sRc - (nk + 1.0) * nr) / (nk.toDouble * nr)
    assert(r.getDouble(6) === rnd6(gini))
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("q245/q246: correlation matrix bounded; z/F consistent with per-group stats") {
    val m = graft.SparkEntry.queries("q245_corr_matrix")(spark, sf001).collect()
    assert(m.length === 6)
    m.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    val z = graft.SparkEntry.queries("q246_ztest_battery")(spark, sf001)
      .collect().head
    val li = graft.schema.Tables.t(spark, sf001, "lineitem")
    val a = li.filter(col("l_returnflag") === "A")
      .agg(count(lit(1)), avg(col("l_extendedprice")), var_pop(col("l_extendedprice")))
      .collect().head
    val b = li.filter(col("l_returnflag") === "R")
      .agg(count(lit(1)), avg(col("l_extendedprice")), var_pop(col("l_extendedprice")))
      .collect().head
    val zExp = (a.getDouble(1) - b.getDouble(1)) /
      math.sqrt(a.getDouble(2) / a.getLong(0) + b.getDouble(2) / b.getLong(0))
    assert(math.abs(z.getDouble(4) - zExp) < 1e-4)
    assert(z.getDouble(5) > 0) // F ratio
    assert(z.getDouble(7) >= 0 && z.getDouble(7) <= 1) // bias-corrected V
  }

  test("q247/q248 plan no single-partition window over the corpus") {
    for (n <- Seq("q247_quantile_modes", "q248_key_skew_audit")) {
      val p = graft.SparkEntry.queries(n)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("windowspecdefinition(v"), s"$n windows on bare value")
      // the stitch's windows carry the bucket key; a bare global
      // Window.orderBy would show an empty partition spec
      assert(!"windowspecdefinition\\(l_".r.findFirstIn(p).isDefined, n)
    }
  }
}
