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

  test("q249: unrolled ray-cast equals a textbook point-in-polygon pass") {
    val poly = Seq((-60.0, -30.0), (40.0, -50.0), (70.0, 0.0), (10.0, 55.0), (-50.0, 40.0))
    def inside(lon: Double, lat: Double): Boolean = {
      val crossings = poly.zip(poly.tail :+ poly.head).count { case ((x1, y1), (x2, y2)) =>
        ((y1 > lat) != (y2 > lat)) && lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
      }
      crossings % 2 == 1
    }
    val custs = graft.schema.Tables.t(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val expected = custs.groupBy(_._2).map { case (nk, cs) =>
      val ins = cs.count { case (ck, _) =>
        val lat = ck * 7919 % 18000 / 100.0 - 90.0
        val lon = ck * 104729 % 36000 / 100.0 - 180.0
        inside(lon, lat)
      }
      nk -> ((cs.length.toLong, ins.toLong))
    }
    val got = graft.SparkEntry.queries("q249_point_in_polygon")(spark, sf001)
      .collect()
      .map(r => r.getAs[Number](0).longValue -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // the polygon discriminates on this corpus: both regimes occur
    assert(got.values.exists(_._2 > 0) && got.values.exists(v => v._2 < v._1))
  }

  test("q250: timed sequence match equals a brute-force pair scan per user") {
    val events = graft.schema.Tables.t(spark, sf001, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = events.groupBy(_._1).flatMap { case (u, evs) =>
      val clicks = evs.filter(_._3 == "click").map(_._2)
      val purchases = evs.filter(_._3 == "purchase").map(_._2)
      if (purchases.isEmpty) None
      else {
        val matched = purchases.count(p =>
          clicks.exists(c => c < p && p - c <= 3600000000L))
        Some(u -> ((purchases.length.toLong, matched.toLong, matched > 0)))
      }
    }
    val got = graft.SparkEntry.queries("q250_sequence_match_timed")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === expected)
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("q251: sample sizes match the closed form from the reported baselines") {
    val r = graft.SparkEntry.queries("q251_min_sample_size")(spark, sf001)
      .collect().head
    val (p1, nConv, m, v, nCont) = (r.getDouble(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4))
    val (za, zb) = (1.959964, 0.841621)
    val p2 = p1 + 0.02; val pbar = (p1 + p1 + 0.02) / 2
    val nc = math.ceil(BigDecimal(
      math.pow(za * math.sqrt(2 * pbar * (1 - pbar))
        + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
        / math.pow(p2 - p1, 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble).toLong
    // base_rate is itself 6dp-rounded in the output, so allow one count
    // of drift from recomputing off the rounded rate
    assert(math.abs(nConv - nc) <= math.max(1L, nc / 1000))
    val ncont = math.ceil(BigDecimal(
      2 * math.pow(za + zb, 2) * v / math.pow(0.02 * m, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    assert(nCont === ncont)
    assert(nConv > 0 && nCont > 0 && p1 > 0 && p1 < 1)
  }

  test("q252: pacf1 equals acf1 and the Durbin-Levinson fold matches q242") {
    val acf = graft.SparkEntry.queries("q242_acf")(spark, sf001)
      .filter(col("lag") <= 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    def rnd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.SparkEntry.queries("q252_pacf")(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val g = r.getString(0)
      val (r1, r2, r3) = (acf((g, 1L)), acf((g, 2L)), acf((g, 3L)))
      assert(r.getDouble(1) === rnd6(r1))
      val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
      assert(r.getDouble(2) === rnd6(p22))
      val p21 = r1 * (1 - p22)
      assert(r.getDouble(3) ===
        rnd6((r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)))
    }
  }

  test("q253: WoE/IV equals brute force over the cohort cells") {
    val events = graft.schema.Tables.t(spark, sf001, "events")
      .select(col("user_id") % 10, col("event_type")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    def rnd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cells = events.groupBy(_._1).map { case (c, es) =>
      c -> ((es.count(_._2 == "purchase") + 0.5, es.count(_._2 != "purchase") + 0.5))
    }
    val gt = cells.values.map(_._1).sum; val bt = cells.values.map(_._2).sum
    val woe = cells.map { case (c, (g, b)) =>
      c -> ((g, b, rnd6(math.log((g / gt) / (b / bt))), g / gt - b / bt))
    }
    val ivTotal = rnd6(woe.values.map(v => rnd6(v._4 * v._3)).sum)
    val got = graft.SparkEntry.queries("q253_information_value")(spark, sf001)
      .collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val (g, b, w, gap) = woe(r.getLong(0))
      assert(r.getLong(1) === (g - 0.5).toLong && r.getLong(2) === (b - 0.5).toLong)
      assert(r.getDouble(3) === w && r.getDouble(4) === rnd6(gap * w))
      assert(r.getDouble(5) === ivTotal)
    }
    assert(ivTotal >= 0.0)
  }

  test("q254: sample is deterministic and the rank cut is pushed map-side") {
    val a = graft.SparkEntry.queries("q254_group_array_sample")(spark, sf001)
      .collect().map(_.toSeq)
    val b = graft.SparkEntry.queries("q254_group_array_sample")(spark, sf001)
      .collect().map(_.toSeq)
    assert(a === b && a.nonEmpty)
    a.foreach(r => assert(r(1).asInstanceOf[String].split(",").length <= 5))
    val plan = graft.SparkEntry.queries("q254_group_array_sample")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k cut must push map-side (WindowGroupLimit)")
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
