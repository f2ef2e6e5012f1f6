package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Round-9 hypothesis-test / interval / decay aggregate parity — the
  * remaining ClickHouse destination-engine statistics a reference user
  * could run on landed tables: studentTTest/welchTTest (q194),
  * mannWhitneyUTest (q195), intervalLengthSum + maxIntersections(Position)
  * (q196), exponentialTimeDecayedAvg (q197). Cf. the reference's
  * ClickHouse DDL surface (/root/reference/internal/collector/
  * collector.go) — the engine its tables land in exposes all of these.
  *
  * Determinism discipline: every test statistic is a ratio of sums.
  * Where the inputs are DECIMAL (q194) or integers (q195, q196), the
  * sums are exact and the double arithmetic downstream is bit-identical
  * across engines — the oracle states the SAME formula over the SAME
  * exact sums, so round() only absorbs the final half-ulp. q197's sums
  * are genuinely floating (weights are transcendental), so both engines
  * round the scale-free ratio.
  */
object Stats2 {

  def qs: Seq[Q] = Seq(

    // ---- two-sample t-tests (studentTTest / welchTTest parity) ----
    // Each market segment vs the REST of the customers, on account
    // balance. One hash aggregate produces per-segment (n, Σx, Σx²) as
    // EXACT decimals (acctbal is DECIMAL(12,2); Σx² is DECIMAL(35,4) —
    // no fp drift, perfectly mergeable partials); the complement group's
    // stats are derived by subtracting from the broadcast 1-row totals,
    // so the "rest" group costs no second scan. All variance/t/df math
    // then runs in doubles from those exact sums — the same IEEE ops the
    // oracle states, so the statistics agree to the last ulp and
    // round(6) is conservative.
    Q("q194_ttests",
      """WITH per AS (SELECT c_mktsegment AS seg, count(*) AS n,
        |    sum(c_acctbal) AS s, sum(c_acctbal * c_acctbal) AS q
        |  FROM customer GROUP BY 1),
        |tot AS (SELECT sum(n) AS nt, sum(s) AS st, sum(q) AS qt FROM per),
        |d AS (SELECT seg,
        |    CAST(n AS DOUBLE) AS na, CAST(nt - n AS DOUBLE) AS nb,
        |    CAST(s AS DOUBLE) AS sa, CAST(st - s AS DOUBLE) AS sb,
        |    CAST(q AS DOUBLE) AS qa, CAST(qt - q AS DOUBLE) AS qb
        |  FROM per, tot),
        |e AS (SELECT seg, na, nb, sa / na AS ma, sb / nb AS mb,
        |    (qa - sa * sa / na) / (na - 1) AS va,
        |    (qb - sb * sb / nb) / (nb - 1) AS vb
        |  FROM d)
        |SELECT seg, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
        |  round((ma - mb) / sqrt((((na - 1) * va + (nb - 1) * vb)
        |      / (na + nb - 2)) * (1 / na + 1 / nb)), 6) AS t_student,
        |  CAST(na + nb - 2 AS BIGINT) AS df_student,
        |  round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_welch,
        |  round(pow(va / na + vb / nb, 2)
        |    / (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)), 4)
        |    AS df_welch
        |FROM e ORDER BY seg""".stripMargin) { (s, dir) =>
      val per = t(s, dir, "customer")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("s"),
          sum(col("c_acctbal") * col("c_acctbal")).as("q"))
      val tot = per.agg(sum(col("n")).as("nt"), sum(col("s")).as("st"),
        sum(col("q")).as("qt"))
      val d = per.crossJoin(broadcast(tot))
        .select(col("seg"),
          col("n").cast("double").as("na"),
          (col("nt") - col("n")).cast("double").as("nb"),
          col("s").cast("double").as("sa"),
          (col("st") - col("s")).cast("double").as("sb"),
          col("q").cast("double").as("qa"),
          (col("qt") - col("q")).cast("double").as("qb"))
      val e = d.select(col("seg"), col("na"), col("nb"),
        (col("sa") / col("na")).as("ma"), (col("sb") / col("nb")).as("mb"),
        ((col("qa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)).as("va"),
        ((col("qb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)).as("vb"))
      val seA = col("va") / col("na")
      val seB = col("vb") / col("nb")
      e.select(col("seg"),
          col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          round(col("ma"), 4).as("mean_a"), round(col("mb"), 4).as("mean_b"),
          round((col("ma") - col("mb")) /
            sqrt((((col("na") - 1) * col("va") + (col("nb") - 1) * col("vb"))
              / (col("na") + col("nb") - 2))
              * (lit(1) / col("na") + lit(1) / col("nb"))), 6).as("t_student"),
          (col("na") + col("nb") - 2).cast("long").as("df_student"),
          round((col("ma") - col("mb")) / sqrt(seA + seB), 6).as("t_welch"),
          round(pow(seA + seB, 2)
            / (pow(seA, 2) / (col("na") - 1) + pow(seB, 2) / (col("nb") - 1)), 4)
            .as("df_welch"))
        .orderBy(col("seg"))
    },

    // ---- Mann–Whitney U (mannWhitneyUTest parity) ----
    // Each event_type vs the REST, on the event value. The rank machinery
    // is EXACT INTEGER end to end: per-distinct-value counts, a stitched
    // global running sum over the distinct-value frame (Skew.
    // globalRunningSum — parallelism scales with distinct-value count, no
    // single-partition window even when the value domain grows with the
    // corpus), and twice-the-average-rank 2·cumBefore + cnt + 1 per
    // value, so tied observations share the textbook midrank without ever
    // touching fractions. The per-group rank sum is then one join on the
    // value key + one hash aggregate. Only the final z-score (normal
    // approximation WITH the tie correction) runs in doubles — from
    // integer inputs, identically stated in the oracle.
    Q("q195_mann_whitney",
      """WITH g AS (SELECT value AS v, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |r AS (SELECT v, cnt,
        |    sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
        |      AS cum_before
        |  FROM g),
        |gs AS (SELECT event_type AS grp, value AS v, count(*) AS cseg
        |  FROM events GROUP BY 1, 2),
        |rs AS (SELECT grp,
        |    sum(cseg) AS n_a,
        |    sum(cseg * (2 * cum_before + cnt + 1)) AS ranksum2
        |  FROM gs JOIN r USING (v) GROUP BY grp),
        |tt AS (SELECT sum(cnt * cnt * cnt - cnt) AS ties, sum(cnt) AS nt
        |  FROM g),
        |z AS (SELECT grp, n_a, ranksum2,
        |    CAST(n_a AS DOUBLE) AS na, CAST(nt - n_a AS DOUBLE) AS nb,
        |    CAST(nt AS DOUBLE) AS n, CAST(ties AS DOUBLE) AS tc
        |  FROM rs, tt)
        |SELECT grp, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(ranksum2 - n_a * (n_a + 1) AS DOUBLE) / 2 AS u,
        |  round((CAST(ranksum2 - n_a * (n_a + 1) AS DOUBLE) / 2 - na * nb / 2)
        |    / sqrt(na * nb / 12 * ((n + 1) - tc / (n * (n - 1)))), 6) AS z
        |FROM z ORDER BY grp""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val g = ev.groupBy(col("value").as("v")).agg(count(lit(1)).as("cnt"))
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val r = Skew.globalRunningSum(g, Seq(col("v")), col("cnt"), parts, "cum")
        .select(col("v"), col("cnt"), (col("cum") - col("cnt")).as("cum_before"))
      val gs = ev.groupBy(col("event_type").as("grp"), col("value").as("v"))
        .agg(count(lit(1)).as("cseg"))
      val rs = gs.join(r, Seq("v"))
        .groupBy(col("grp"))
        .agg(sum(col("cseg")).as("n_a"),
          sum(col("cseg") * (lit(2) * col("cum_before") + col("cnt") + 1))
            .as("ranksum2"))
      val tt = g.agg(
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"),
        sum(col("cnt")).as("nt"))
      val u2 = col("ranksum2") - col("n_a") * (col("n_a") + 1)
      rs.crossJoin(broadcast(tt))
        .select(col("grp"), col("n_a"), col("ranksum2"),
          col("n_a").cast("double").as("na"),
          (col("nt") - col("n_a")).cast("double").as("nb"),
          col("nt").cast("double").as("n"),
          col("ties").cast("double").as("tc"))
        .select(col("grp"), col("n_a").cast("long").as("n_a"),
          (u2.cast("double") / 2).as("u"),
          round((u2.cast("double") / 2 - col("na") * col("nb") / 2)
            / sqrt(col("na") * col("nb") / 12
              * ((col("n") + 1) - col("tc") / (col("n") * (col("n") - 1)))), 6)
            .as("z"))
        .orderBy(col("grp"))
    },

    // ---- interval union length + max overlap (intervalLengthSum /
    //      maxIntersections / maxIntersectionsPosition parity) ----
    // Each event opens a half-open 5-minute activity interval
    // [ts, ts+300s). Per user: total COVERED time (overlaps counted
    // once — the sweep is a running max of interval ends over the
    // preceding rows, each row contributing max(0, end − max(start,
    // prev_max_end)) microseconds), the maximum number of simultaneously
    // open intervals (±1 boundary events, running sum; at a shared
    // timestamp the −1 sorts first, so touching intervals do NOT
    // intersect — the half-open convention, stated identically in the
    // oracle), and the earliest instant that maximum is reached. All
    // windows key on user_id (cardinality grows with the corpus — the
    // q169/q178 rule), all arithmetic is exact integer microseconds.
    Q("q196_interval_analytics",
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + 300000000 AS en
        |  FROM events),
        |cov AS (SELECT user_id,
        |    greatest(en - greatest(st, coalesce(max(en) OVER (
        |      PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), st)),
        |      0) AS contrib
        |  FROM iv),
        |un AS (SELECT user_id, sum(contrib) AS covered_us FROM cov GROUP BY 1),
        |b AS (SELECT user_id, st AS tp, 1 AS d, event_id FROM iv
        |  UNION ALL SELECT user_id, en, -1, event_id FROM iv),
        |dep AS (SELECT user_id, tp,
        |    sum(d) OVER (PARTITION BY user_id ORDER BY tp, d, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
        |  FROM b),
        |mx AS (SELECT user_id, max(depth) AS max_depth FROM dep GROUP BY 1),
        |pk AS (SELECT dep.user_id, min(tp) AS peak_us
        |  FROM dep JOIN mx ON dep.user_id = mx.user_id
        |    AND dep.depth = mx.max_depth
        |  GROUP BY 1)
        |SELECT user_id, CAST(covered_us AS BIGINT) AS covered_us,
        |  CAST(max_depth AS BIGINT) AS max_depth,
        |  CAST(peak_us AS BIGINT) AS peak_us
        |FROM un JOIN mx USING (user_id) JOIN pk USING (user_id)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val iv = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("st"),
          (unix_micros(col("ts").cast("timestamp")) + lit(300000000L)).as("en"))
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("st"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val un = iv
        .select(col("user_id"),
          greatest(col("en") - greatest(col("st"),
            coalesce(max(col("en")).over(wPrev), col("st"))), lit(0L))
            .as("contrib"))
        .groupBy(col("user_id")).agg(sum(col("contrib")).as("covered_us"))
      val b = iv.select(col("user_id"), col("st").as("tp"), lit(1).as("d"),
          col("event_id"))
        .unionAll(iv.select(col("user_id"), col("en").as("tp"),
          lit(-1).as("d"), col("event_id")))
      val wDep = Window.partitionBy(col("user_id"))
        .orderBy(col("tp"), col("d"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dep = b.select(col("user_id"), col("tp"),
        sum(col("d")).over(wDep).as("depth"))
      // max depth + earliest peak instant in ONE aggregate: lexicographic
      // max over (depth, −tp) picks the max depth, then the min tp in it
      val mx = dep.groupBy(col("user_id"))
        .agg(max(struct(col("depth"), (-col("tp")).as("ntp"))).as("m"))
        .select(col("user_id"), col("m.depth").as("max_depth"),
          (-col("m.ntp")).as("peak_us"))
      un.join(mx, Seq("user_id"))
        .select(col("user_id"), col("covered_us").cast("long").as("covered_us"),
          col("max_depth").cast("long").as("max_depth"),
          col("peak_us").cast("long").as("peak_us"))
        .orderBy(col("user_id"))
    },

    // ---- exponentially time-decayed average (exponentialTimeDecayedAvg
    //      parity, half-life form) ----
    // Per user, the decayed mean of `value` at the user's LAST event,
    // half-life 1 hour: Σ vⱼ·2^(−Δⱼ/h) / Σ 2^(−Δⱼ/h), Δⱼ = T − tⱼ.
    // Anchoring the decay at the per-user max timestamp (one unordered
    // per-user window max, then plain commutative sums) keeps every
    // weight in (0, 1] — no overflow at ANY history length, unlike the
    // classic running-product rewrite 2^(t/h) which explodes past ~1000
    // half-lives — and needs no ordered iteration at all: the whole
    // aggregate is two map-side-combinable sums. Weights are
    // transcendental, so the sums are genuinely floating; the ratio is
    // scale-free and round(6) absorbs summation-order ulps.
    Q("q197_time_decayed_avg",
      """WITH w AS (SELECT user_id, value, epoch_us(ts) AS us,
        |    max(epoch_us(ts)) OVER (PARTITION BY user_id) AS mx
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value * pow(2.0, -((mx - us) / 3600000000.0)))
        |    / sum(pow(2.0, -((mx - us) / 3600000000.0))), 6) AS decayed_avg
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val wUser = Window.partitionBy(col("user_id"))
      val w = t(s, dir, "events")
        .select(col("user_id"), col("value"), unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("mx", max(col("us")).over(wUser))
      val decay = pow(lit(2.0),
        -((col("mx") - col("us")) / lit(3600000000.0)))
      w.groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          round(sum(col("value") * decay) / sum(decay), 6).as("decayed_avg"))
        .orderBy(col("user_id"))
    }
  )
}
