package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants of the q194–q197 hypothesis-test / interval / decay battery
  * that the DuckDB oracle cannot state (the oracle checks VALUES; these
  * check the statistical contracts). */
class Stats2Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("q194: complements partition the population; Welch df between min-1 and pooled df") {
    val rows = q("q194_ttests").collect()
    assert(rows.length == 5)
    val total = rows.head.getAs[Long]("n_a") + rows.head.getAs[Long]("n_b")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == total,
        "every segment-vs-rest split must cover the same population")
      assert(r.getAs[Long]("df_student") == total - 2)
      val dfW = r.getAs[Double]("df_welch")
      val lo = math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) - 1.0
      assert(dfW >= lo - 1e-9 && dfW <= (total - 2) + 1e-9,
        s"Welch–Satterthwaite df $dfW outside [$lo, ${total - 2}]")
      // same mean difference, different scaling: the two t's share a sign
      assert(r.getAs[Double]("t_student").sign == r.getAs[Double]("t_welch").sign ||
        r.getAs[Double]("t_student") == 0.0)
    }
  }

  test("q195: U within [0, na*nb] and the five one-vs-rest U's obey ΣU = Σ na*nb / 2-ish per-row bound") {
    val rows = q("q195_mann_whitney").collect()
    assert(rows.length == 5)
    val n = rows.map(_.getAs[Long]("n_a")).sum
    rows.foreach { r =>
      val na = r.getAs[Long]("n_a"); val nb = n - na
      val u = r.getAs[Double]("u")
      assert(u >= 0.0 && u <= na.toDouble * nb,
        s"U=$u outside [0, ${na.toDouble * nb}]")
      // U_A + U_B = na*nb; recompute U_B by symmetry from the z-free identity:
      // 2·(R_A + R_B) over the SAME ranking must equal n(n+1) ⇒ U_B determined
      val uB = na.toDouble * nb - u
      assert(uB >= 0.0 && uB <= na.toDouble * nb)
    }
  }

  test("q195: hand-computed U on a tiny two-group frame (textbook midranks)") {
    // values: A = [1, 2, 2], B = [2, 3] → ranks 1, 3, 3, 3, 5
    // R_A = 1 + 3 + 3 = 7, U_A = 7 − 3·4/2 = 1
    val s = spark
    import s.implicits._
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
      .toDF("grp", "v")
    val g = df.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val r = Skew.globalRunningSum(g, Seq(col("v")), col("cnt"), 2, "cum")
      .select(col("v"), col("cnt"), (col("cum") - col("cnt")).as("cum_before"))
    val rs = df.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cseg"))
      .join(r, Seq("v"))
      .groupBy(col("grp"))
      .agg(sum(col("cseg")).as("n_a"),
        sum(col("cseg") * (lit(2) * col("cum_before") + col("cnt") + 1)).as("r2"))
      .collect().map(x => x.getAs[String]("grp") ->
        (x.getAs[Long]("n_a"), x.getAs[Long]("r2"))).toMap
    val (na, r2a) = rs("A")
    assert(na == 3 && r2a == 14, s"twice-ranksum of A should be 14, got $r2a")
    assert((r2a - na * (na + 1)) / 2.0 == 1.0)
    val (nb, r2b) = rs("B")
    assert(nb == 2 && (r2b - nb * (nb + 1)) / 2.0 == 5.0) // U_A + U_B = 3·2
  }

  test("q196: covered time within [300s, n·300s]; peak depth witnessed by covered < n·300s iff depth > 1") {
    val byUser = q("q196_interval_analytics").collect()
    assert(byUser.nonEmpty)
    val counts = graft.schema.Tables.t(spark, sf001, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    byUser.foreach { r =>
      val n = counts(r.getAs[Long]("user_id"))
      val cov = r.getAs[Long]("covered_us")
      val depth = r.getAs[Long]("max_depth")
      assert(cov >= 300000000L && cov <= n * 300000000L)
      assert(depth >= 1L && depth <= n)
      // depth 1 everywhere ⇔ no overlap ⇔ union is the full n·300s
      if (depth == 1L) assert(cov == n * 300000000L)
      if (cov == n * 300000000L) assert(depth == 1L)
    }
  }

  test("q197: decayed average lies within the user's value range; single-event user is exact") {
    val rows = q("q197_time_decayed_avg").collect()
    assert(rows.nonEmpty)
    val ranges = graft.schema.Tables.t(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    rows.foreach { r =>
      val (lo, hi) = ranges(r.getAs[Long]("user_id"))
      val ema = r.getAs[Double]("decayed_avg")
      assert(ema >= lo - 1e-6 && ema <= hi + 1e-6,
        s"convex combination must stay inside [$lo, $hi], got $ema")
      if (r.getAs[Long]("n_events") == 1L)
        assert(math.abs(ema - lo) < 1e-6)
    }
  }

  test("q199: dense grid, observed endpoints, interpolations convex between neighbors") {
    val rows = q("q199_gapfill_interpolate")
      .collect().groupBy(_.getAs[Long]("user_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("hr"))
      // grid is gap-free and endpoints are real observations
      assert(sorted.head.getAs[Boolean]("observed"), s"user $u: first grid hour must be observed")
      assert(sorted.last.getAs[Boolean]("observed"), s"user $u: last grid hour must be observed")
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b.getAs[Long]("hr") == a.getAs[Long]("hr") + 1, s"user $u: grid gap")
      }
      // every filled value lies between its surrounding observations
      val obs = sorted.filter(_.getAs[Boolean]("observed"))
        .map(r => r.getAs[Long]("hr") -> r.getAs[Double]("filled"))
      sorted.filterNot(_.getAs[Boolean]("observed")).foreach { r =>
        val h = r.getAs[Long]("hr"); val v = r.getAs[Double]("filled")
        val (ph, pv) = obs.takeWhile(_._1 < h).last
        val (nh, nv) = obs.dropWhile(_._1 < h).head
        assert(v >= math.min(pv, nv) - 1e-9 && v <= math.max(pv, nv) + 1e-9,
          s"user $u hr $h: $v outside [$pv, $nv]")
        val expect = pv + (nv - pv) * (h - ph).toDouble / (nh - ph)
        assert(math.abs(v - expect) < 1e-9, s"user $u hr $h: $v != $expect")
      }
    }
  }

  test("q203: rho in [-1, 1] and matches a sequential midrank Spearman per type") {
    val rows = q("q203_rank_corr").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("rho")).toMap
    assert(rows.size == 5)
    rows.values.foreach(rho => assert(rho >= -1.0 && rho <= 1.0))
    // independent sequential recomputation (plain Scala, no Spark)
    val data = graft.schema.Tables.t(spark, sf001, "events")
      .select(col("event_type"), col("value"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def midranks[T](xs: Seq[T])(implicit o: Ordering[T]): Map[T, Double] =
      xs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1).
        foldLeft((0L, Map.empty[T, Double])) { case ((before, acc), (v, cnt)) =>
          (before + cnt, acc + (v -> (before + (cnt + 1) / 2.0)))
        }._2
    data.groupBy(_._1).foreach { case (g, es) =>
      val rv = midranks(es.toSeq.map(_._2))
      val ru = midranks(es.toSeq.map(_._3))
      val xs = es.map(e => rv(e._2)); val ys = es.map(e => ru(e._3))
      val n = xs.length.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val rho = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(rows(g) - rho) < 1e-5,
        s"type $g: query rho ${rows(g)} vs sequential $rho")
    }
  }

  test("q205: D matches a sequential two-sample KS; p in [0, 1]") {
    val row = q("q205_ks_test").collect().head
    val (na, nb) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    val d = row.getAs[Double]("d")
    assert(d >= 0.0 && d <= 1.0)
    assert(row.getAs[Double]("p_approx") >= 0.0 && row.getAs[Double]("p_approx") <= 1.0)
    val vals = graft.schema.Tables.t(spark, sf001, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "click").map(_._2).sorted
    val b = vals.filter(_._1 == "purchase").map(_._2).sorted
    assert(a.length == na && b.length == nb)
    // sequential sup over the pooled distinct values
    val dist = (a ++ b).distinct.sorted
    val dSeq = dist.map { v =>
      val fa = a.count(_ <= v).toDouble / a.length
      val fb = b.count(_ <= v).toDouble / b.length
      math.abs(fa - fb)
    }.max
    assert(math.abs(d - dSeq) < 1e-6, s"query D $d vs sequential $dSeq")
    assert(row.getAs[Long]("d_num") == math.round(dSeq * na * nb))
  }

  test("q213: quantiles monotone in q, on the grid, and match a sequential recompute") {
    val rows = q("q213_quantile_timing").collect()
      .map(r => (r.getAs[Double]("q"), r.getAs[Long]("timing_ms"), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.5, 0.9, 0.99))
    rows.map(_._2).sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    def onGrid(v: Long) =
      v < 1024 || (v <= 30000 && v % 16 == 0) || v == 30000
    rows.foreach { case (_, v, _) => assert(onGrid(v), s"$v off the timing grid") }
    val ms = graft.schema.Tables.t(spark, sf001, "events")
      .select(floor(col("value") * 10).cast("long").as("ms"))
      .collect().map(_.getLong(0))
      .map(m => if (m < 1024) m else if (m <= 30000) m / 16 * 16 else 30000L)
      .sorted
    rows.foreach { case (qq, v, n) =>
      assert(n == ms.length)
      val thr = math.ceil(qq * ms.length).toLong
      // smallest bucket whose cumulative count reaches the threshold ==
      // the thr-th order statistic of the bucketed values
      assert(v == ms(thr.toInt - 1), s"q=$qq: $v != ${ms(thr.toInt - 1)}")
    }
  }
}
