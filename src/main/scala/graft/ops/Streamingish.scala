package graft.ops


import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Event-time streaming semantics, batch-expressible for the DuckDB oracle
  * (SURVEY.md §7.2 step 4): the same `window`/`session_window` column
  * functions power `readStream` pipelines unchanged — `graft.ingest.
  * Pipeline` wires them to a streaming source with watermarks; here they
  * run over the batch `events` table so correctness is checkable.
  *
  * Scale: all of these group/partition by (user_id | window), so state is
  * hash-distributed across executors; in streaming form the state store is
  * per-partition RocksDB and watermarks bound its size.
  */
object Streamingish {

  private def dec6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  /** The q135 funnel core over ANY (user_id, ts, event_type) frame: per
    * user the reached depth of view → click → purchase within 24 h of the
    * first view. Pure per-user aggregation — a user's level depends only
    * on their own events — which is exactly what lets the incremental
    * composition (StreamingFunnelSpec) recompute the report over the
    * accumulated idempotent store and equal the batch answer (a later
    * batch can DEEPEN a user's funnel, or RESET its anchor with an
    * earlier view). Returns (user_id, level). */
  def windowFunnel(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val a1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val a2 = ev.filter(col("event_type") === "click")
      .join(a1, Seq("user_id"))
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val a3 = ev.filter(col("event_type") === "purchase")
      .join(a1, Seq("user_id")).join(a2, Seq("user_id"))
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    ev.select(col("user_id")).distinct()
      .join(a1, Seq("user_id"), "left")
      .join(a2, Seq("user_id"), "left")
      .join(a3, Seq("user_id"), "left")
      .select(col("user_id"), when(col("t3").isNotNull, 3)
        .when(col("t2").isNotNull, 2)
        .when(col("t1").isNotNull, 1)
        .otherwise(0).as("level"))
  }

  val qs: Seq[Q] = Seq(

    // ---- tumbling event-time window ----
    // Output normalization for the driver's hasher: window bounds are LTZ
    // (events.ts is), which parquet-encodes as INT96/ns — cast to
    // TIMESTAMP_NTZ so both engines emit timestamp[us]; the exact decimal
    // sum gets one final cast to DOUBLE (see Relational.sumD rationale).
    Q("q34_tumbling_window",
      """SELECT date_trunc('hour', ts) AS w_start,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY w_start""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"),
          sum(dec6(col("value"))).cast("double").as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("w_start"),
          col("window.end").cast("timestamp_ntz").as("w_end"),
          col("n"), col("sum_value"))
        .orderBy(col("w_start"))
    },

    // ---- sliding event-time window (1h width, 30m hop → 2 windows/event) ----
    Q("q35_sliding_window",
      """SELECT time_bucket(INTERVAL '30 minutes', ts) - k.k * INTERVAL 30 MINUTE AS w_start,
        |  count(*) AS n
        |FROM events CROSS JOIN (VALUES (0), (1)) k(k)
        |GROUP BY 1
        |ORDER BY w_start""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n"))
        .orderBy(col("w_start"))
    },

    // ---- session window (10-minute gap) ----
    // Oracle reproduces Spark's merge rule (same session iff gap < 10 min;
    // session end = last event + gap) as gaps-and-islands SQL.
    Q("q36_session_window",
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sgrp AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |)
        |SELECT user_id,
        |  min(ts) AS sess_start,
        |  max(ts) + INTERVAL 10 MINUTE AS sess_end,
        |  count(*) AS n_events
        |FROM sgrp
        |GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"), col("n_events"))
        .orderBy(col("user_id"), col("sess_start"))
    },

    // ---- keep-first dedup (deterministic twin of dropDuplicates /
    //      dropDuplicatesWithinWatermark: first row per key by event time) ----
    Q("q37_dedup_first",
      """SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
        |FROM (SELECT user_id, event_type, event_id, ts,
        |        row_number() OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("first_event_id"), col("ts").as("first_ts"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // ---- as-of join (point-in-time lookup) ----
    // For every 'error' event: timestamp of the latest 'click' by the same
    // user at or before it. Implemented the scalable way — tag + union +
    // one running max over (user, time) — a single shuffle by user_id, no
    // per-row subquery, no broadcast of the big side. The oracle states the
    // same semantics as a correlated subquery.
    Q("q38_asof_join",
      """SELECT e.event_id, e.user_id,
        |  (SELECT max(c.ts) FROM events c
        |   WHERE c.user_id = e.user_id AND c.event_type = 'click'
        |     AND c.ts <= e.ts) AS last_click_ts
        |FROM events e
        |WHERE e.event_type = 'error'
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("t"), lit(0).as("kind"),
          col("ts").as("click_ts"), lit(null).cast("long").as("event_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("t"), lit(1).as("kind"),
          lit(null).cast("timestamp").as("click_ts"), col("event_id"))
      // kind orders clicks before errors at equal t → "at or before" (<=)
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(errors)
        .withColumn("last_click_ts", max(col("click_ts")).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("last_click_ts"))
        .orderBy(col("event_id"))
    },

    // ---- windowFunnel: conversion-depth analytics ----
    // Parity with ClickHouse's signature parametric aggregate
    // `windowFunnel(window)(ts, cond1, cond2, cond3)` (the analytics the
    // reference's destination engine is famous for), in the deterministic
    // FIRST-ANCHOR variant: the funnel anchors at the user's EARLIEST
    // step-1 event, each later step is the earliest qualifying event
    // strictly after the previous step and within `window` of the anchor.
    // (ClickHouse scans every candidate chain; anchoring at the first
    // entry makes the operator a chain of three narrow per-user
    // aggregates — each an equi-join on user_id + min() — with identical
    // results on funnels that convert promptly, and a plan that is three
    // hash-aggregates instead of a per-user state machine.) Funnel here:
    // view → click → purchase within 24 hours (the corpus averages one
    // event per ~7 user-hours, so an hour-scale window has no reach). Output: users per reached
    // depth (0 = never viewed).
    Q("q135_window_funnel",
      """WITH a1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |a2 AS (SELECT e.user_id, min(ts) AS t2
        |  FROM events e JOIN a1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t1
        |    AND ts <= t1 + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |a3 AS (SELECT e.user_id, min(ts) AS t3
        |  FROM events e JOIN a1 USING (user_id) JOIN a2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2
        |    AND ts <= t1 + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT CASE WHEN t3 IS NOT NULL THEN 3
        |            WHEN t2 IS NOT NULL THEN 2
        |            WHEN t1 IS NOT NULL THEN 1
        |            ELSE 0 END AS level,
        |  count(*) AS n_users
        |FROM u LEFT JOIN a1 USING (user_id) LEFT JOIN a2 USING (user_id)
        |  LEFT JOIN a3 USING (user_id)
        |GROUP BY 1
        |ORDER BY level""".stripMargin) { (s, dir) =>
      windowFunnel(t(s, dir, "events"))
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    },

    // ---- retention: cohort comeback analytics ----
    // ClickHouse's `retention(cond1, cond2, ...)` semantics exactly: per
    // user an array of flags where flag1 = cond1 ever held and
    // flag_i (i>1) = cond1 AND cond_i — later conditions only count for
    // users who satisfied the first (the cohort gate). Conditions here:
    // active on Jan 1 / Jan 2 / Jan 3. One conditional-aggregate pass per
    // user then one tiny sum — two narrow shuffles, no joins at all.
    Q("q136_retention",
      """WITH per_user AS (SELECT user_id,
        |    max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01' THEN 1 ELSE 0 END) AS d1,
        |    max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-02' THEN 1 ELSE 0 END) AS d2,
        |    max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-03' THEN 1 ELSE 0 END) AS d3
        |  FROM events GROUP BY user_id)
        |SELECT CAST(sum(d1) AS BIGINT) AS r1,
        |  CAST(sum(d1 * d2) AS BIGINT) AS r2,
        |  CAST(sum(d1 * d3) AS BIGINT) AS r3
        |FROM per_user""".stripMargin) { (s, dir) =>
      val day = (d: String) =>
        max(when(col("ts").cast("date") === lit(d).cast("date"), 1).otherwise(0))
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(day("2024-01-01").as("d1"), day("2024-01-02").as("d2"),
          day("2024-01-03").as("d3"))
        .agg(sum(col("d1")).cast("bigint").as("r1"),
          sum(col("d1") * col("d2")).cast("bigint").as("r2"),
          sum(col("d1") * col("d3")).cast("bigint").as("r3"))
    },

    // ---- sequenceMatch: ordered-pattern existence ----
    // ClickHouse `sequenceMatch('(?1).*(?2)')(ts, cond1, cond2)` — did
    // the user ever do cond1 before cond2? For the existence pattern the
    // state machine reduces to min(ts | cond1) < max(ts | cond2), so the
    // whole operator is one conditional aggregate per user — the proof
    // that most sequence patterns a funnel dashboard uses need no
    // per-user event replay at all. Pattern: error before purchase.
    Q("q137_sequence_match",
      """SELECT user_id,
        |  (min(CASE WHEN event_type = 'error' THEN ts END)
        |   < max(CASE WHEN event_type = 'purchase' THEN ts END)) AS matched
        |FROM events
        |GROUP BY user_id
        |HAVING matched IS NOT NULL
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((min(when(col("event_type") === "error", col("ts"))) <
          max(when(col("event_type") === "purchase", col("ts")))).as("matched"))
        .filter(col("matched").isNotNull)
        .orderBy(col("user_id"))
    },

    // ---- windowFunnel strict_order mode ----
    // q135 is the default (greedy-earliest-chain) windowFunnel; this is
    // ClickHouse's `strict_order` mode: the funnel advances ONLY while
    // the tracked-event stream matches the step sequence exactly — the
    // first tracked event that is not the next expected step ends the
    // chain. Semantics reduce to the user's first 3 tracked events in
    // (ts, event_id) order: level = longest prefix of (view, click,
    // purchase) they spell, with steps 2-3 inside the 24 h window from
    // step 1. One user-keyed window (user_id cardinality GROWS with the
    // corpus — the q169 rationale) + one conditional aggregate; no
    // per-user state machine, no collect.
    Q("q220_funnel_strict_order",
      """WITH tracked AS (SELECT user_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |f3 AS (SELECT user_id,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS e1,
        |    max(CASE WHEN rn = 1 THEN ts END) AS t1,
        |    max(CASE WHEN rn = 2 THEN event_type END) AS e2,
        |    max(CASE WHEN rn = 2 THEN ts END) AS t2,
        |    max(CASE WHEN rn = 3 THEN event_type END) AS e3,
        |    max(CASE WHEN rn = 3 THEN ts END) AS t3
        |  FROM tracked WHERE rn <= 3 GROUP BY user_id),
        |lvl AS (SELECT user_id, CASE
        |    WHEN e1 = 'view' AND e2 = 'click' AND e3 = 'purchase'
        |         AND t3 <= t1 + INTERVAL 24 HOUR THEN 3
        |    WHEN e1 = 'view' AND e2 = 'click'
        |         AND t2 <= t1 + INTERVAL 24 HOUR THEN 2
        |    WHEN e1 = 'view' THEN 1 ELSE 0 END AS level
        |  FROM f3),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT coalesce(lvl.level, 0) AS level,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM u LEFT JOIN lvl USING (user_id)
        |GROUP BY 1 ORDER BY level""".stripMargin) { (s, dir) =>
      val W = org.apache.spark.sql.expressions.Window
      val tracked = t(s, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .withColumn("rn", row_number().over(W.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
        .filter(col("rn") <= 3)
      val f3 = tracked.groupBy(col("user_id")).agg(
        max(when(col("rn") === 1, col("event_type"))).as("e1"),
        max(when(col("rn") === 1, col("ts"))).as("t1"),
        max(when(col("rn") === 2, col("event_type"))).as("e2"),
        max(when(col("rn") === 2, col("ts"))).as("t2"),
        max(when(col("rn") === 3, col("event_type"))).as("e3"),
        max(when(col("rn") === 3, col("ts"))).as("t3"))
      val lvl = f3.select(col("user_id"),
        when(col("e1") === "view" && col("e2") === "click" &&
          col("e3") === "purchase" &&
          col("t3") <= col("t1") + expr("INTERVAL 24 HOURS"), 3)
          .when(col("e1") === "view" && col("e2") === "click" &&
            col("t2") <= col("t1") + expr("INTERVAL 24 HOURS"), 2)
          .when(col("e1") === "view", 1)
          .otherwise(0).as("level"))
      t(s, dir, "events").select(col("user_id")).distinct()
        .join(lvl, Seq("user_id"), "left")
        .select(coalesce(col("level"), lit(0)).as("level"))
        .groupBy(col("level")).agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy(col("level"))
    },

    // ---- windowFunnel strict_dedup + strict_increase modes ----
    // The two remaining ClickHouse funnel modes beside the default
    // (q135) and strict_order (q220), both from ONE shared chain of
    // per-user conditional aggregates over the first-'view' anchor:
    //   t1 = first view; t2 = first click strictly after t1;
    //   t3 = first purchase strictly after t2;
    //   d1v = first DUPLICATE view after t1; d2v/d2c = first duplicate
    //   view/click after t2.
    // strict_increase needs only t1<t2<t3 (already strict by
    // construction) within the 24 h window; strict_dedup additionally
    // interrupts the chain when a repeat of an already-matched
    // condition arrives before the next step (t2 < d1v for step 2,
    // t3 < min(d2v, d2c) for step 3). Every stage is a user-keyed
    // hash aggregate joined back on user_id — the q135 chained-narrow-
    // aggregate shape, never a per-user collect or state machine.
    Q("q233_funnel_modes",
      raw"""WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = 'view' GROUP BY user_id),
           |s2 AS (SELECT e.user_id, any_value(t1.t1) AS t1,
           |    min(CASE WHEN event_type = 'click' AND ts > t1.t1 THEN ts END) AS t2,
           |    min(CASE WHEN event_type = 'view' AND ts > t1.t1 THEN ts END) AS d1v
           |  FROM events e JOIN t1 ON e.user_id = t1.user_id
           |  GROUP BY e.user_id),
           |s3 AS (SELECT e.user_id,
           |    min(CASE WHEN event_type = 'purchase' AND ts > s2.t2 THEN ts END) AS t3,
           |    min(CASE WHEN event_type = 'view' AND ts > s2.t2 THEN ts END) AS d2v,
           |    min(CASE WHEN event_type = 'click' AND ts > s2.t2 THEN ts END) AS d2c
           |  FROM events e JOIN s2 ON e.user_id = s2.user_id
           |  WHERE s2.t2 IS NOT NULL
           |  GROUP BY e.user_id),
           |lv AS (SELECT s2.user_id,
           |    CASE WHEN s3.t3 IS NOT NULL
           |              AND s3.t3 <= s2.t1 + INTERVAL 24 HOUR THEN 3
           |         WHEN s2.t2 IS NOT NULL
           |              AND s2.t2 <= s2.t1 + INTERVAL 24 HOUR THEN 2
           |         ELSE 1 END AS lvl_inc,
           |    CASE WHEN s3.t3 IS NOT NULL
           |              AND s3.t3 <= s2.t1 + INTERVAL 24 HOUR
           |              AND (s2.d1v IS NULL OR s2.t2 < s2.d1v)
           |              AND s3.t3 < coalesce(s3.d2v, TIMESTAMP '9999-01-01')
           |              AND s3.t3 < coalesce(s3.d2c, TIMESTAMP '9999-01-01')
           |         THEN 3
           |         WHEN s2.t2 IS NOT NULL
           |              AND s2.t2 <= s2.t1 + INTERVAL 24 HOUR
           |              AND (s2.d1v IS NULL OR s2.t2 < s2.d1v) THEN 2
           |         ELSE 1 END AS lvl_dedup
           |  FROM s2 LEFT JOIN s3 ON s2.user_id = s3.user_id),
           |u AS (SELECT DISTINCT user_id FROM events)
           |SELECT mode, level, CAST(count(*) AS BIGINT) AS n_users FROM (
           |  SELECT 'strict_increase' AS mode, coalesce(lvl_inc, 0) AS level
           |  FROM u LEFT JOIN lv USING (user_id)
           |  UNION ALL
           |  SELECT 'strict_dedup' AS mode, coalesce(lvl_dedup, 0) AS level
           |  FROM u LEFT JOIN lv USING (user_id))
           |GROUP BY mode, level ORDER BY mode, level""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.join(t1, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(first(col("t1")).as("t1"),
          min(when(col("event_type") === "click" && col("ts") > col("t1"),
            col("ts"))).as("t2"),
          min(when(col("event_type") === "view" && col("ts") > col("t1"),
            col("ts"))).as("d1v"))
      val s3 = ev.join(s2.filter(col("t2").isNotNull)
          .select(col("user_id"), col("t2").as("t2j")), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "purchase" && col("ts") > col("t2j"),
            col("ts"))).as("t3"),
          min(when(col("event_type") === "view" && col("ts") > col("t2j"),
            col("ts"))).as("d2v"),
          min(when(col("event_type") === "click" && col("ts") > col("t2j"),
            col("ts"))).as("d2c"))
      val far = lit("9999-01-01").cast("timestamp_ntz")
      val lv = s2.join(s3, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t3").isNotNull &&
            col("t3") <= col("t1") + expr("INTERVAL 24 HOURS"), 3)
            .when(col("t2").isNotNull &&
              col("t2") <= col("t1") + expr("INTERVAL 24 HOURS"), 2)
            .otherwise(1).as("lvl_inc"),
          when(col("t3").isNotNull &&
            col("t3") <= col("t1") + expr("INTERVAL 24 HOURS") &&
            (col("d1v").isNull || col("t2") < col("d1v")) &&
            col("t3") < coalesce(col("d2v"), far) &&
            col("t3") < coalesce(col("d2c"), far), 3)
            .when(col("t2").isNotNull &&
              col("t2") <= col("t1") + expr("INTERVAL 24 HOURS") &&
              (col("d1v").isNull || col("t2") < col("d1v")), 2)
            .otherwise(1).as("lvl_dedup"))
      val u = ev.select(col("user_id")).distinct()
      val inc = u.join(lv, Seq("user_id"), "left")
        .select(lit("strict_increase").as("mode"),
          coalesce(col("lvl_inc"), lit(0)).as("level"))
      val ded = u.join(lv, Seq("user_id"), "left")
        .select(lit("strict_dedup").as("mode"),
          coalesce(col("lvl_dedup"), lit(0)).as("level"))
      inc.unionAll(ded)
        .groupBy(col("mode"), col("level"))
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy(col("mode"), col("level"))
    },

    // ---- time-constrained sequence match ----
    // ClickHouse `sequenceMatch('(?1)(?t<=3600)(?2)')`: does a click →
    // purchase pair exist with the purchase AT MOST 1 h after the click?
    // q137 is the unconstrained order test; the time condition changes
    // the shape — existence is no longer two scalar extremes. The
    // scale-correct reduction: one user-keyed window carries the latest
    // click instant seen STRICTLY BEFORE each row (max of a conditional
    // over ROWS UNBOUNDED PRECEDING..1 PRECEDING — user_id cardinality
    // grows with the corpus, the q169 rule), then each purchase row
    // tests its gap locally and one aggregate counts matches per user.
    // No pair join, no per-user collect; exact integer microseconds.
    Q("q250_sequence_match_timed",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type, event_id
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT user_id, us, event_type,
        |    max(CASE WHEN event_type = 'click' THEN us END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
        |  FROM e)
        |SELECT user_id,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
        |    AS n_purchases,
        |  CAST(count(CASE WHEN event_type = 'purchase' AND last_click IS NOT NULL
        |    AND us - last_click <= 3600000000 THEN 1 END) AS BIGINT) AS n_matched,
        |  count(CASE WHEN event_type = 'purchase' AND last_click IS NOT NULL
        |    AND us - last_click <= 3600000000 THEN 1 END) > 0 AS matched
        |FROM w
        |GROUP BY user_id
        |HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val hit = col("event_type") === "purchase" && col("last_click").isNotNull &&
        col("us") - col("last_click") <= 3600000000L
      t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_type"), col("event_id"))
        .withColumn("last_click",
          max(when(col("event_type") === "click", col("us"))).over(w))
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "purchase", 1)).cast("long")
            .as("n_purchases"),
          count(when(hit, 1)).cast("long").as("n_matched"),
          (count(when(hit, 1)) > 0).as("matched"))
        .filter(col("n_purchases") > 0)
        .orderBy(col("user_id"))
    },

    // ---- funnel conversion-latency exact deciles ----
    // The companion distribution to q135's funnel counts and q250's timed
    // match: how LONG does click→purchase take? Per user, latency = first
    // purchase strictly after the first click, in whole seconds (exact
    // integer difference), then the EXACT latency deciles across users.
    // No row-level rank: the stitched global running count over the
    // DISTINCT latency frame gives each latency a rank interval, decile
    // ranks are the exact integers (n·d + 9) div 10, and the 9-row decile
    // spine joins the interval that contains each rank — the q264 rank-
    // interval arithmetic applied to a derived funnel metric. Work scales
    // with distinct latencies; the per-user phase is two hash aggregates
    // and one user-keyed join.
    Q("q265_conversion_latency",
      """WITH c AS (SELECT user_id, min(ts) AS c_ts FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id,
        |    (epoch_us(min(e.ts)) - epoch_us(min(c.c_ts))) // 1000000 AS lat
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |  GROUP BY 1),
        |g AS (SELECT lat, count(*) AS cnt FROM p GROUP BY 1),
        |cc AS (SELECT lat, cnt,
        |    sum(cnt) OVER (ORDER BY lat
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM g),
        |t AS (SELECT max(cum) AS n FROM cc),
        |sp AS (SELECT unnest(range(1, 10)) AS d)
        |SELECT CAST(d AS BIGINT) AS decile,
        |  CAST((t.n * d + 9) // 10 AS BIGINT) AS rank_at,
        |  CAST(t.n AS BIGINT) AS n_users,
        |  CAST(cc.lat AS BIGINT) AS latency_s
        |FROM sp, t, cc
        |WHERE (t.n * d + 9) // 10 > cc.cum - cc.cnt
        |  AND (t.n * d + 9) // 10 <= cc.cum
        |ORDER BY decile""".stripMargin) { (s, dir) =>
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val ev = t(s, dir, "events")
      val c = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id"))
        .agg(((unix_micros(min(col("ts")).cast("timestamp"))
          - unix_micros(min(col("c_ts")).cast("timestamp"))) / lit(1000000L))
          .cast("long").as("lat"))
      val g = p.groupBy(col("lat")).agg(count(lit(1)).as("cnt"))
      val cc = Skew.globalRunningSum(g, Seq(col("lat")), col("cnt"), parts,
        "cum", totalCol = Some("n"))
      val sp = s.range(1, 10).select(col("id").as("d"))
      cc.crossJoin(broadcast(sp))
        .filter(expr("(n * d + 9) div 10") > col("cum") - col("cnt")
          && expr("(n * d + 9) div 10") <= col("cum"))
        .select(col("d").cast("long").as("decile"),
          expr("(n * d + 9) div 10").cast("long").as("rank_at"),
          col("n").cast("long").as("n_users"),
          col("lat").cast("long").as("latency_s"))
        .orderBy(col("decile"))
    },

    // ---- top user paths (first-3-event journey mining) ----
    // The Sankey/path-analysis staple next to q202's sequenceNextNode:
    // each user's first three events (by ts, event_id tiebreak) form a
    // journey string; count users per journey, top-20. The per-user rank
    // is a window over the HIGH-cardinality user key (state scales out
    // with users); the first-3 pivot avoids ordered string_agg — max-per-
    // rank is associative, so partial-agg order can't reorder the path —
    // and concat_ws drops the missing steps of short histories
    // identically in both engines.
    Q("q273_user_paths",
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id,
        |    concat_ws('>',
        |      max(CASE WHEN rn = 1 THEN event_type END),
        |      max(CASE WHEN rn = 2 THEN event_type END),
        |      max(CASE WHEN rn = 3 THEN event_type END)) AS path
        |  FROM r WHERE rn <= 3 GROUP BY 1)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1
        |ORDER BY n_users DESC, path
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val r = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
      r.groupBy(col("user_id"))
        .agg(concat_ws(">",
          max(when(col("rn") === 1, col("event_type"))),
          max(when(col("rn") === 2, col("event_type"))),
          max(when(col("rn") === 3, col("event_type")))).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    }
  )
}
