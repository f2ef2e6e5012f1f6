package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Q
import graft.schema.Tables.t

/** Time-series diagnostics over the landed `events` table — the
  * seriesPeriodDetectFFT / seriesOutliersDetectTukey-adjacent surface of
  * the destination engine (cf. /root/reference/cmd/kafka-consumer/prepare-functions.go:161-176
  * — the reference's users run analytical SQL at the ClickHouse end):
  * dominant-period detection (q239), CUSUM changepoint (q240), Theil–Sen
  * robust trend (q241), autocorrelation (q242).
  *
  * One scale discipline for the whole family: the corpus is reduced FIRST
  * to a calendar-bounded frame (hourly or daily aggregates — rows bounded
  * by the observed timespan, never by the event count) with exact DECIMAL
  * partials, and the statistic runs on that tiny frame. Windows/self-joins
  * below always run on the aggregated frame — at 100 TB the only
  * corpus-size-dependent work is the first map-side-combined GROUP BY.
  *
  * Determinism discipline: transcendental weights (cos/sin) quantize at
  * 9 dp and then sum as exact DECIMALs so association order can't drift
  * (the q208/q239 libm rule); pure-integer/DECIMAL statistics (q240) stay
  * exact end-to-end; double medians select explicit ranked elements
  * instead of engine-interpolated quantiles (q241). */
object TimeSeries {

  /** Daily exact-decimal partials per event_type: (event_type, day_idx,
    * day, cnt, s). day_idx is integer epoch-days (UTC-pinned), `s` the
    * DECIMAL(18,6) value sum — shared by q240/q241/q242. */
  private def daily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        (unix_micros(col("ts").cast("timestamp")) / 86400000000L)
          .cast("long").as("day_idx"),
        to_date(col("ts").cast("timestamp")).as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy(col("event_type"), col("day_idx"), col("day"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("s"))

  /** The daily CTE stated once for every oracle in the family. */
  private val DailySql =
    raw"""d AS (SELECT event_type,
         |    epoch_us(ts) // 86400000000 AS day_idx,
         |    CAST(ts AS DATE) AS day,
         |    count(*) AS cnt,
         |    sum(CAST(value AS DECIMAL(18,6))) AS s
         |  FROM events GROUP BY 1, 2, 3)""".stripMargin

  def qs: Seq[Q] = Seq(

    // ---- dominant-period detection (seriesPeriodDetectFFT parity) ----
    // Discrete-Fourier power of the hourly event-count series at every
    // candidate period 2..24 h. The DFT weights cos/sin(2π·(t mod p)/p)
    // are transcendental (libm, 1-ulp cross-engine) so each weight
    // quantizes at 9 dp into DECIMAL(12,9) FIRST; count·weight products
    // then sum EXACTLY, making the spectral sums order-immune, and only
    // the final power re-enters double space. (t mod p keeps the argument
    // small — cos of a 6-digit phase would amplify the libm divergence.)
    // Shape: one corpus GROUP BY to the hourly frame (rows = timespan
    // hours × types), a broadcast 23-row period spine, one tiny aggregate.
    Q("q239_periodogram",
      raw"""WITH h AS (SELECT event_type,
           |    epoch_us(ts) // 3600000000 AS hr, count(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |sp AS (SELECT unnest(range(2, 25)) AS p),
           |w AS (SELECT event_type, p,
           |    CAST(cnt AS DECIMAL(20,0))
           |      * CAST(round(cos(2 * pi() * (hr % p) / p), 9)
           |             AS DECIMAL(12,9)) AS tc,
           |    CAST(cnt AS DECIMAL(20,0))
           |      * CAST(round(sin(2 * pi() * (hr % p) / p), 9)
           |             AS DECIMAL(12,9)) AS ts
           |  FROM h CROSS JOIN sp)
           |SELECT event_type, CAST(p AS BIGINT) AS p,
           |  round(CAST(sum(tc) AS DOUBLE) * CAST(sum(tc) AS DOUBLE)
           |        + CAST(sum(ts) AS DOUBLE) * CAST(sum(ts) AS DOUBLE), 6)
           |    AS power
           |FROM w GROUP BY event_type, p
           |ORDER BY event_type, p""".stripMargin) { (s, dir) =>
      val h = t(s, dir, "events")
        .select(col("event_type"),
          (unix_micros(col("ts").cast("timestamp")) / 3600000000L)
            .cast("long").as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("cnt"))
      val sp = s.range(2, 25).select(col("id").as("p"))
      val theta = lit(2) * lit(math.Pi) * (col("hr") % col("p")) / col("p")
      val w = h.crossJoin(broadcast(sp))
        .select(col("event_type"), col("p"),
          (col("cnt").cast("decimal(20,0)")
            * round(cos(theta), 9).cast("decimal(12,9)")).as("tc"),
          (col("cnt").cast("decimal(20,0)")
            * round(sin(theta), 9).cast("decimal(12,9)")).as("ts"))
      w.groupBy(col("event_type"), col("p"))
        .agg(round(sum(col("tc")).cast("double") * sum(col("tc")).cast("double")
          + sum(col("ts")).cast("double") * sum(col("ts")).cast("double"), 6)
          .as("power"))
        .select(col("event_type"), col("p").cast("long").as("p"), col("power"))
        .orderBy(col("event_type"), col("p"))
    },

    // ---- CUSUM changepoint detection ----
    // Per event_type, the day k maximizing |n·S_k − k·S_n| over the
    // daily-sum series (the scaled CUSUM deviation — multiplying through
    // by n keeps every comparison EXACT DECIMAL, so the argmax cannot
    // drift on ulps; ties break to the earliest day, stated in both
    // engines). The window runs over the AGGREGATED daily frame (≤
    // timespan-days rows per type — the q155 rule), never the corpus.
    Q("q240_cusum_changepoint",
      raw"""WITH $DailySql,
           |c AS (SELECT event_type, day_idx, day,
           |    row_number() OVER w AS k,
           |    sum(s) OVER (PARTITION BY event_type ORDER BY day_idx
           |                 ROWS UNBOUNDED PRECEDING) AS cum,
           |    count(*) OVER (PARTITION BY event_type) AS n,
           |    sum(s) OVER (PARTITION BY event_type) AS tot
           |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day_idx))
           |SELECT event_type, day AS cp_day,
           |  CAST(abs(n * cum - k * tot) AS DOUBLE) AS stat,
           |  CAST(n AS BIGINT) AS n_days
           |FROM c
           |QUALIFY row_number() OVER (PARTITION BY event_type
           |  ORDER BY abs(n * cum - k * tot) DESC, day_idx ASC) = 1
           |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val byDay = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      val whole = Window.partitionBy(col("event_type"))
      val c = daily(s, dir)
        .select(col("event_type"), col("day_idx"), col("day"),
          row_number().over(byDay).as("k"),
          sum(col("s")).over(byDay.rowsBetween(Window.unboundedPreceding, 0))
            .as("cum"),
          count(lit(1)).over(whole).as("n"),
          sum(col("s")).over(whole).as("tot"))
        .withColumn("stat0", abs(col("n") * col("cum") - col("k") * col("tot")))
      c.withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("stat0").desc, col("day_idx").asc)))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day").as("cp_day"),
          col("stat0").cast("double").as("stat"),
          col("n").cast("long").as("n_days"))
        .orderBy(col("event_type"))
    },

    // ---- Theil–Sen robust trend (median of pairwise slopes) ----
    // Per event_type over the daily-mean series: the median pairwise
    // slope (m_j − m_i)/(j − i) — the outlier-robust trend estimator.
    // The O(T²) pair join runs on the DAILY frame: T is the observed
    // timespan in days, so pair count is calendar-bounded (≤ T²/2 per
    // type) and independent of the corpus row count. The median is an
    // explicitly RANKED element — rows (n+1) DIV 2 and n DIV 2 + 1 of
    // the (slope, i, j)-ordered pair frame, averaged — because engine
    // quantile interpolation (l+(u−l)·f vs l·(1−f)+u·f) differs by ulps;
    // selecting elements makes the median bit-deterministic.
    Q("q241_theil_sen",
      raw"""WITH $DailySql,
           |m AS (SELECT event_type, day_idx,
           |    CAST(s AS DOUBLE) / cnt AS m FROM d),
           |p AS (SELECT a.event_type,
           |    (b.m - a.m) / (b.day_idx - a.day_idx) AS slope,
           |    a.day_idx AS i, b.day_idx AS j
           |  FROM m a JOIN m b ON a.event_type = b.event_type
           |    AND a.day_idx < b.day_idx),
           |r AS (SELECT event_type, slope,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY slope, i, j) AS rn,
           |    count(*) OVER (PARTITION BY event_type) AS n
           |  FROM p)
           |SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_pairs,
           |  round(avg(slope), 9) AS slope_median
           |FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
           |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val m = daily(s, dir)
        .select(col("event_type"), col("day_idx"),
          (col("s").cast("double") / col("cnt")).as("m"))
      val a = m.select(col("event_type"), col("day_idx").as("i"), col("m").as("ma"))
      val b = m.select(col("event_type"), col("day_idx").as("j"), col("m").as("mb"))
      val p = a.join(b, Seq("event_type")).filter(col("i") < col("j"))
        .select(col("event_type"),
          ((col("mb") - col("ma")) / (col("j") - col("i"))).as("slope"),
          col("i"), col("j"))
      val r = p.select(col("event_type"), col("slope"),
        row_number().over(Window.partitionBy(col("event_type"))
          .orderBy(col("slope"), col("i"), col("j"))).as("rn"),
        count(lit(1)).over(Window.partitionBy(col("event_type"))).as("n"))
      r.filter(col("rn") === (col("n") + 1) / 2 || col("rn") === col("n") / 2 + 1)
        .groupBy(col("event_type"))
        .agg(first(col("n")).cast("long").as("n_pairs"),
          round(avg(col("slope")), 9).as("slope_median"))
        .orderBy(col("event_type"))
    },

    // ---- autocorrelation function (lags 1..7) ----
    // Per event_type: ACF of the daily-mean series at weekly-scale lags —
    // r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)². The series values quantize
    // ONCE at 9 dp (DECIMAL(28,9)) so the mean is a ratio of an exact sum;
    // deviation products re-quantize at 9 dp and sum exactly — the whole
    // statistic is association-order-immune and only the final ratio is
    // floating. Lag pairs come from a self-join of the daily frame on
    // day_idx + k (calendar-bounded, like q241's pairs).
    Q("q242_acf",
      raw"""WITH $AcfSql
           |SELECT event_type, lag, n_terms, acf FROM acf
           |ORDER BY event_type, lag""".stripMargin) { (s, dir) =>
      acfFrame(s, dir).orderBy(col("event_type"), col("lag"))
    },

    // ---- partial autocorrelation (PACF lags 1–3) ----
    // Durbin–Levinson on q242's ACF values: φ11 = r1, φ22 = (r2 − r1²)
    // / (1 − r1²), φ33 = (r3 − φ21·r2 − φ22·r1) / (1 − φ21·r1 − φ22·r2)
    // with φ21 = r1(1 − φ22) — the AR-order diagnostic every
    // Box–Jenkins pass reads next to the ACF. The recursion depth is a
    // CONSTANT 3, so it unrolls into one closed-form projection over
    // the |event types|-row pivoted ACF frame (the q204/q212
    // constant-depth discipline); determinism comes free because the
    // inputs are q242's already-6dp-rounded ratios and both engines
    // state the identical expression tree over them.
    Q("q252_pacf",
      raw"""WITH $AcfSql,
           |p AS (SELECT event_type,
           |    max(CASE WHEN lag = 1 THEN acf END) AS r1,
           |    max(CASE WHEN lag = 2 THEN acf END) AS r2,
           |    max(CASE WHEN lag = 3 THEN acf END) AS r3
           |  FROM acf GROUP BY 1),
           |lv AS (SELECT event_type, r1, r2, r3,
           |    (r2 - r1 * r1) / (1 - r1 * r1) AS p22 FROM p),
           |lv2 AS (SELECT event_type, r1, r2, r3, p22,
           |    r1 * (1 - p22) AS p21 FROM lv)
           |SELECT event_type,
           |  round(r1, 6) AS pacf1,
           |  round(p22, 6) AS pacf2,
           |  round((r3 - p21 * r2 - p22 * r1)
           |    / (1 - p21 * r1 - p22 * r2), 6) AS pacf3
           |FROM lv2
           |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val p = acfFrame(s, dir).filter(col("lag") <= 3)
        .groupBy(col("event_type"))
        .agg(max(when(col("lag") === 1, col("acf"))).as("r1"),
          max(when(col("lag") === 2, col("acf"))).as("r2"),
          max(when(col("lag") === 3, col("acf"))).as("r3"))
      val lv = p.withColumn("p22",
        (col("r2") - col("r1") * col("r1")) / (lit(1) - col("r1") * col("r1")))
      val lv2 = lv.withColumn("p21", col("r1") * (lit(1) - col("p22")))
      lv2.select(col("event_type"),
          round(col("r1"), 6).as("pacf1"),
          round(col("p22"), 6).as("pacf2"),
          round((col("r3") - col("p21") * col("r2") - col("p22") * col("r1"))
            / (lit(1) - col("p21") * col("r1") - col("p22") * col("r2")), 6)
            .as("pacf3"))
        .orderBy(col("event_type"))
    },

    // ---- additive seasonal decomposition (STL-lite) ----
    // The classical decomposition behind seriesDecomposeSTL, restated
    // with deterministic arithmetic: per event_type over the HOURLY count
    // series, trend = 25-point centered moving average (RANGE-bounded on
    // h_idx so calendar gaps shrink the window and those edges yield NULL
    // trend — only exact-25 windows survive), seasonal = per-phase
    // (hour-of-day) mean of the detrended series re-centered by the
    // overall detrended mean, residual = detrended − seasonal, and
    // seasonal strength = max(0, 1 − var(resid)/var(detrended)).
    //
    // Determinism: the detrended value quantizes at 6 dp into
    // DECIMAL(18,6) the moment it's born (trend is one exact integer-sum
    // division), every later mean/variance is a ratio of exact DECIMAL
    // sums, and only final ratios re-enter double space (the family's
    // q240/q242 discipline). Windows run over the hourly AGGREGATE
    // (calendar-bounded: rows = hours in span, not event count).
    Q("q261_seasonal_decompose",
      """WITH h AS (SELECT event_type,
        |    epoch_us(ts) // 3600000000 AS h_idx, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |tw AS (SELECT event_type, h_idx, h_idx % 24 AS phase, cnt,
        |    sum(cnt) OVER w AS s25, count(*) OVER w AS n25
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY h_idx
        |    RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT event_type, phase,
        |    CAST(round(cnt - CAST(s25 AS DOUBLE) / 25, 6) AS DECIMAL(18,6)) AS detr
        |  FROM tw WHERE n25 = 25),
        |sm AS (SELECT event_type, phase, count(*) AS n, sum(detr) AS sd
        |  FROM d GROUP BY 1, 2),
        |ctr AS (SELECT event_type, sum(sd) AS tsd, sum(n) AS tn
        |  FROM sm GROUP BY 1),
        |sc AS (SELECT sm.event_type, phase, n,
        |    CAST(round(CAST(sd AS DOUBLE) / n
        |      - CAST(tsd AS DOUBLE) / tn, 6) AS DECIMAL(18,6)) AS seasonal
        |  FROM sm JOIN ctr ON sm.event_type = ctr.event_type),
        |r AS (SELECT d.event_type, d.detr - sc.seasonal AS resid, d.detr AS dt
        |  FROM d JOIN sc ON d.event_type = sc.event_type AND d.phase = sc.phase),
        |v AS (SELECT event_type, count(*) AS nv,
        |    sum(resid) AS sr, sum(resid * resid) AS srr,
        |    sum(dt) AS sd2, sum(dt * dt) AS sdd
        |  FROM r GROUP BY 1),
        |st AS (SELECT event_type,
        |    round(greatest(0,
        |      1 - (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)
        |            / CAST(nv AS DOUBLE))
        |        / (CAST(sdd AS DOUBLE) - CAST(sd2 AS DOUBLE) * CAST(sd2 AS DOUBLE)
        |            / CAST(nv AS DOUBLE))), 6) AS strength
        |  FROM v)
        |SELECT sc.event_type, CAST(phase AS BIGINT) AS phase,
        |  CAST(n AS BIGINT) AS n, CAST(seasonal AS DOUBLE) AS seasonal,
        |  st.strength AS strength
        |FROM sc JOIN st ON sc.event_type = st.event_type
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val h = t(s, dir, "events")
        .select(col("event_type"),
          (unix_micros(col("ts").cast("timestamp")) / 3600000000L)
            .cast("long").as("h_idx"))
        .groupBy(col("event_type"), col("h_idx"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h_idx"))
        .rangeBetween(-12, 12)
      val dec = "decimal(18,6)"
      val d = h
        .select(col("event_type"), (col("h_idx") % 24).as("phase"), col("cnt"),
          sum(col("cnt")).over(w).as("s25"), count(lit(1)).over(w).as("n25"))
        .filter(col("n25") === 25)
        .select(col("event_type"), col("phase"),
          round(col("cnt") - col("s25").cast("double") / 25, 6).cast(dec).as("detr"))
      val sm = d.groupBy(col("event_type"), col("phase"))
        .agg(count(lit(1)).as("n"), sum(col("detr")).as("sd"))
      val ctr = sm.groupBy(col("event_type"))
        .agg(sum(col("sd")).as("tsd"), sum(col("n")).as("tn"))
      val sc = sm.join(broadcast(ctr), Seq("event_type"))
        .select(col("event_type"), col("phase"), col("n"),
          round(col("sd").cast("double") / col("n")
            - col("tsd").cast("double") / col("tn"), 6).cast(dec).as("seasonal"))
      val r = d.join(broadcast(sc), Seq("event_type", "phase"))
        .select(col("event_type"),
          (col("detr") - col("seasonal")).as("resid"), col("detr").as("dt"))
      val v = r.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nv"), sum(col("resid")).as("sr"),
          sum(col("resid") * col("resid")).as("srr"),
          sum(col("dt")).as("sd2"), sum(col("dt") * col("dt")).as("sdd"))
      val nvD = col("nv").cast("double")
      val st = v.select(col("event_type"),
        round(greatest(lit(0),
          lit(1) - (col("srr").cast("double")
              - col("sr").cast("double") * col("sr").cast("double") / nvD)
            / (col("sdd").cast("double")
              - col("sd2").cast("double") * col("sd2").cast("double") / nvD)), 6)
          .as("strength"))
      sc.join(broadcast(st), Seq("event_type"))
        .select(col("event_type"), col("phase").cast("long").as("phase"),
          col("n").cast("long").as("n"),
          col("seasonal").cast("double").as("seasonal"), col("strength"))
        .orderBy(col("event_type"), col("phase"))
    },

    // ---- exact rolling 7-day active users (WAU) per day ----
    // The product metric a sliding count-distinct can't decompose:
    // |{users active in [d−6, d]}| is NOT a sum of daily counts, and
    // sketch unions (q181) are approximate. The exact scalable shape is
    // the cover-explode: each DISTINCT (user, day) activity contributes
    // to the 7 covering days — a BOUNDED ×7 fanout on the deduplicated
    // pair frame (never on raw events) — then one distinct count per
    // cover day. DAU rides the same pair frame; stickiness = DAU/WAU.
    // Trailing phantom days are cut against the broadcast max day.
    Q("q266_sliding_wau",
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day_idx
        |  FROM events),
        |mx AS (SELECT max(day_idx) AS md FROM ud),
        |cov AS (SELECT DISTINCT user_id, day_idx + k AS d
        |  FROM ud, (SELECT unnest(range(0, 7)) AS k) sp),
        |wau AS (SELECT d, count(*) AS wau
        |  FROM cov, mx WHERE d <= md GROUP BY d),
        |dau AS (SELECT day_idx AS d, count(*) AS dau FROM ud GROUP BY 1)
        |SELECT wau.d AS day_idx, CAST(dau.dau AS BIGINT) AS dau,
        |  CAST(wau.wau AS BIGINT) AS wau,
        |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
        |FROM wau JOIN dau ON wau.d = dau.d
        |ORDER BY day_idx""".stripMargin) { (s, dir) =>
      rollingWau(t(s, dir, "events")
        .select(col("user_id"),
          (unix_micros(col("ts").cast("timestamp")) / 86400000000L)
            .cast("long").as("day_idx")))
    },

    // ---- Mann–Kendall trend test (significance companion to q241) ----
    // Theil–Sen gives the robust slope; Mann–Kendall decides whether a
    // monotone trend is THERE: S = Σ_{i<j} sign(m_j − m_i) over the daily
    // series, Var(S) with the tie correction, and the continuity-
    // corrected z. Everything up to the final z is INTEGER arithmetic —
    // sign comparisons on the 9dp-rounded daily means (identical doubles
    // both engines), exact tie-group counts, and both variance terms as
    // exact integer numerators over 18 — so the only floating step is
    // one division and one sqrt. Pair count is calendar-bounded (q241's
    // argument verbatim).
    Q("q270_mann_kendall",
      raw"""WITH $DailySql,
           |m AS (SELECT event_type, day_idx,
           |    round(CAST(s AS DOUBLE) / cnt, 9) AS m FROM d),
           |p AS (SELECT a.event_type AS event_type,
           |    sum(CASE WHEN b.m > a.m THEN 1
           |             WHEN b.m < a.m THEN -1 ELSE 0 END) AS s_stat,
           |    count(*) AS n_pairs
           |  FROM m a JOIN m b ON a.event_type = b.event_type
           |    AND a.day_idx < b.day_idx
           |  GROUP BY 1),
           |nd AS (SELECT event_type, count(*) AS n FROM m GROUP BY 1),
           |ties AS (SELECT event_type,
           |    coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie_num
           |  FROM (SELECT event_type, m, count(*) AS t FROM m GROUP BY 1, 2) tg
           |  WHERE t > 1 GROUP BY 1),
           |v AS (SELECT nd.event_type AS event_type, n, s_stat, n_pairs,
           |    (n * (n - 1) * (2 * n + 5) - coalesce(tie_num, 0)) AS var18
           |  FROM nd JOIN p ON nd.event_type = p.event_type
           |    LEFT JOIN ties ON nd.event_type = ties.event_type)
           |SELECT event_type, CAST(n AS BIGINT) AS n_days,
           |  CAST(s_stat AS BIGINT) AS s_stat,
           |  round(CAST(var18 AS DOUBLE) / 18, 6) AS var_s,
           |  round(CASE WHEN s_stat > 0
           |      THEN (s_stat - 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
           |    WHEN s_stat < 0
           |      THEN (s_stat + 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
           |    ELSE 0.0 END, 6) AS z
           |FROM v ORDER BY event_type""".stripMargin) { (s, dir) =>
      val m = daily(s, dir)
        .select(col("event_type"), col("day_idx"),
          round(col("s").cast("double") / col("cnt"), 9).as("m"))
      val a = m.select(col("event_type"), col("day_idx").as("i"), col("m").as("ma"))
      val b = m.select(col("event_type"), col("day_idx").as("j"), col("m").as("mb"))
      val p = a.join(b, Seq("event_type")).filter(col("i") < col("j"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("mb") > col("ma"), 1L)
          .when(col("mb") < col("ma"), -1L).otherwise(0L)).as("s_stat"),
          count(lit(1)).as("n_pairs"))
      val nd = m.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ties = m.groupBy(col("event_type"), col("m"))
        .agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .groupBy(col("event_type"))
        .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)),
          lit(0L)).as("tie_num"))
      val v = nd.join(p, Seq("event_type"))
        .join(ties, Seq("event_type"), "left")
        .select(col("event_type"), col("n"), col("s_stat"),
          (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
            - coalesce(col("tie_num"), lit(0L))).as("var18"))
      val sd = sqrt(col("var18").cast("double") / 18)
      v.select(col("event_type"), col("n").cast("long").as("n_days"),
          col("s_stat").cast("long").as("s_stat"),
          round(col("var18").cast("double") / 18, 6).as("var_s"),
          round(when(col("s_stat") > 0, (col("s_stat") - 1) / sd)
            .when(col("s_stat") < 0, (col("s_stat") + 1) / sd)
            .otherwise(lit(0.0)), 6).as("z"))
        .orderBy(col("event_type"))
    }
  )

  /** q266's Spark side over any (user_id, day_idx) activity frame —
    * the streaming refresh composition (StreamingWauSpec) recomputes it
    * over the accumulated idempotent store; dedup happens here, so raw
    * multi-event and replayed frames are both fine. */
  private[graft] def rollingWau(pairs: DataFrame): DataFrame = {
    val ud = pairs.select(col("user_id"), col("day_idx")).distinct()
    val mx = ud.agg(max(col("day_idx")).as("md"))
    val cov = ud.select(col("user_id"), col("day_idx"),
        explode(sequence(lit(0), lit(6))).as("k"))
      .select(col("user_id"), (col("day_idx") + col("k")).as("d"))
      .distinct()
    val wau = cov.crossJoin(broadcast(mx)).filter(col("d") <= col("md"))
      .groupBy(col("d")).agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy(col("day_idx").as("d")).agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("d"))
      .select(col("d").as("day_idx"), col("dau").cast("long").as("dau"),
        col("wau").cast("long").as("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy(col("day_idx"))
  }

  /** q242's ACF pipeline as a frame: (event_type, lag 1–7, n_terms, acf)
    * with acf already rounded at 6 dp — shared by q242 and q252. */
  private def acfFrame(s: SparkSession, dir: String): DataFrame = {
    val m = daily(s, dir)
      .select(col("event_type"), col("day_idx"),
        round(col("s").cast("double") / col("cnt"), 9)
          .cast("decimal(28,9)").as("md"))
    val xb = m.groupBy(col("event_type"))
      .agg((sum(col("md")).cast("double") / count(lit(1))).as("xbar"))
    val dev = m.join(xb, Seq("event_type"))
      .select(col("event_type"), col("day_idx"),
        (col("md").cast("double") - col("xbar")).as("dv"))
    val den = dev.groupBy(col("event_type"))
      .agg(sum(round(col("dv") * col("dv"), 9).cast("decimal(28,9)")).as("den"))
    val sp = s.range(1, 8).select(col("id").as("lag"))
    val a = dev.crossJoin(broadcast(sp))
    val b = dev.select(col("event_type"), col("day_idx").as("bj"), col("dv").as("dvb"))
    a.join(b, a("event_type") === b("event_type")
        && col("bj") === col("day_idx") + col("lag"))
      .drop(b("event_type"))
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(round(col("dv") * col("dvb"), 9).cast("decimal(28,9)")).as("num"),
        count(lit(1)).cast("long").as("n_terms"))
      .join(den, Seq("event_type"))
      .select(col("event_type"), col("lag").cast("long").as("lag"),
        col("n_terms"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("acf"))
  }

  /** The ACF CTE chain stated once for the q242/q252 oracles: defines
    * `acf` with (event_type, lag, n_terms, acf@6dp). */
  private lazy val AcfSql: String =
    raw"""$DailySql,
         |m AS (SELECT event_type, day_idx,
         |    CAST(round(CAST(s AS DOUBLE) / cnt, 9) AS DECIMAL(28,9)) AS md
         |  FROM d),
         |xb AS (SELECT event_type,
         |    CAST(sum(md) AS DOUBLE) / count(*) AS xbar FROM m GROUP BY 1),
         |dev AS (SELECT m.event_type, day_idx,
         |    CAST(md AS DOUBLE) - xbar AS dv
         |  FROM m JOIN xb ON m.event_type = xb.event_type),
         |den AS (SELECT event_type,
         |    sum(CAST(round(dv * dv, 9) AS DECIMAL(28,9))) AS den
         |  FROM dev GROUP BY 1),
         |sp AS (SELECT unnest(range(1, 8)) AS lag),
         |num AS (SELECT a.event_type, lag,
         |    sum(CAST(round(a.dv * b.dv, 9) AS DECIMAL(28,9))) AS num,
         |    count(*) AS n_terms
         |  FROM dev a CROSS JOIN sp
         |  JOIN dev b ON a.event_type = b.event_type
         |    AND b.day_idx = a.day_idx + lag
         |  GROUP BY 1, 2),
         |acf AS (SELECT num.event_type, CAST(lag AS BIGINT) AS lag,
         |    CAST(n_terms AS BIGINT) AS n_terms,
         |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
         |  FROM num JOIN den ON num.event_type = den.event_type)""".stripMargin
}
