package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Model-evaluation / distribution-drift metrics at corpus scale — the
  * companion surface to the quality classifiers (q74/q156): once a
  * filter model scores 100 TB of documents, these are the aggregates
  * that decide whether to trust it. ROC curve with exact confusion
  * counts (q206), calibration / reliability bins (q207), population
  * stability index (q208). Score = the event value, label = purchase —
  * stand-ins with the same shapes as any classifier-score column.
  *
  * Exactness discipline: confusion counts are integers off the stitched
  * distinct-score prefix (q205's machinery), bin rates are exact-integer
  * divisions, and every transcendental (ln in PSI) is applied to
  * identical doubles in both engines — only cross-row double SUMS
  * (q208's total) get a round(6).
  */
object ModelEval {

  def qs: Seq[Q] = Seq(

    // ---- ROC curve with exact confusion counts ----
    // One row per distinct score threshold v: the confusion matrix of
    // the rule "predict positive when score ≥ v". TP/FP come from the
    // SAME two stitched prefix sums the KS test uses (total + positive
    // counts over the distinct-score frame — parallelism scales with
    // score cardinality); tpr/fpr are exact divisions. The trapezoid
    // integral of this curve must equal the midrank AUC — pinned in
    // `ModelEvalSpec`, not here, because the oracle already re-derives
    // every row.
    Q("q206_roc_curve",
      """WITH e AS (SELECT value AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (SELECT v, count(*) AS cnt, sum(y) AS pos FROM e GROUP BY 1),
        |r AS (SELECT v, cnt, pos,
        |    sum(cnt) OVER wo AS cumt, sum(pos) OVER wo AS cump
        |  FROM g
        |  WINDOW wo AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |n AS (SELECT sum(pos) AS np, sum(cnt - pos) AS nn FROM g)
        |SELECT v AS thr,
        |  CAST(np - cump + pos AS BIGINT) AS tp,
        |  CAST(cump - pos AS BIGINT) AS fn,
        |  CAST(nn - (cumt - cump) + (cnt - pos) AS BIGINT) AS fp,
        |  CAST((cumt - cump) - (cnt - pos) AS BIGINT) AS tn,
        |  CAST(np - cump + pos AS DOUBLE) / CAST(np AS DOUBLE) AS tpr,
        |  CAST(nn - (cumt - cump) + (cnt - pos) AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS fpr
        |FROM r, n ORDER BY thr""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("value").as("v"),
          when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)).as("y"))
      val g = e.groupBy(col("v"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      // both prefixes in ONE stitch (one boundary sample, one exchange)
      val cums = Skew.globalRunningSums(g, Seq(col("v")),
        Seq(col("cnt") -> "cumt", col("pos") -> "cump"), parts)
      val n = g.agg(sum(col("pos")).as("np"), sum(col("cnt") - col("pos")).as("nn"))
      val tp = col("np") - col("cump") + col("pos")
      val fp = col("nn") - (col("cumt") - col("cump")) + (col("cnt") - col("pos"))
      cums.crossJoin(broadcast(n))
        .select(col("v").as("thr"),
          tp.cast("long").as("tp"),
          (col("cump") - col("pos")).cast("long").as("fn"),
          fp.cast("long").as("fp"),
          ((col("cumt") - col("cump")) - (col("cnt") - col("pos")))
            .cast("long").as("tn"),
          (tp.cast("double") / col("np").cast("double")).as("tpr"),
          (fp.cast("double") / col("nn").cast("double")).as("fpr"))
        .orderBy(col("thr"))
    },

    // ---- calibration / reliability bins ----
    // Treat score/500 as a predicted probability; 10 fixed bins. Per
    // bin: count, mean predicted probability (EXACT: the 2-decimal score
    // sums as DECIMAL, one division at the end), observed positive rate
    // (exact integer division), and the calibration gap. Fixed bin edges
    // mean one hash aggregate, perfectly mergeable at any scale.
    Q("q207_calibration_bins",
      """WITH e AS (SELECT value,
        |    least(CAST(floor(value / 50) AS BIGINT), 9) AS b,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events)
        |SELECT b, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / (count(*) * 500)
        |    AS mean_pred,
        |  CAST(sum(y) AS DOUBLE) / count(*) AS obs_rate,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / (count(*) * 500)
        |    - CAST(sum(y) AS DOUBLE) / count(*) AS gap
        |FROM e GROUP BY b ORDER BY b""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("value"),
          least(floor(col("value") / 50).cast("long"), lit(9L)).as("b"),
          when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)).as("y"))
      val meanPred = sum(col("value").cast("decimal(18,2)")).cast("double") /
        (count(lit(1)) * 500)
      val obsRate = sum(col("y")).cast("double") / count(lit(1))
      e.groupBy(col("b"))
        .agg(count(lit(1)).cast("long").as("n"),
          meanPred.as("mean_pred"), obsRate.as("obs_rate"),
          (meanPred - obsRate).as("gap"))
        .orderBy(col("b"))
    },

    // ---- population stability index (the binned drift score) ----
    // PSI between the even- and odd-user cohorts over 10 fixed score
    // bins: Σ (p_a − p_b)·ln(p_a / p_b). The rates are exact-integer
    // divisions (identical doubles, left unrounded — the q199 rule), but
    // ln is NOT bit-portable: DuckDB's libm and the JVM disagree by one
    // ulp on some inputs (measured at sf0.1), so the per-bin term rounds
    // at 9 decimals — 12 orders of magnitude above the ulp noise. Zero
    // bins take the standard 0.5-count continuity correction, stated
    // identically in the oracle; the 10-term total rounds at 6.
    Q("q208_psi",
      """WITH e AS (SELECT least(CAST(floor(value / 50) AS BIGINT), 9) AS b,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS isa
        |  FROM events),
        |g AS (SELECT b, sum(isa) AS ca, sum(1 - isa) AS cb FROM e GROUP BY 1),
        |n AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM g),
        |p AS (SELECT b,
        |    (CASE WHEN ca = 0 THEN 0.5 ELSE CAST(ca AS DOUBLE) END)
        |      / CAST(na AS DOUBLE) AS pa,
        |    (CASE WHEN cb = 0 THEN 0.5 ELSE CAST(cb AS DOUBLE) END)
        |      / CAST(nb AS DOUBLE) AS pb
        |  FROM g, n),
        |terms AS (SELECT b, pa, pb, round((pa - pb) * ln(pa / pb), 9) AS term
        |  FROM p)
        |SELECT b, pa, pb, term,
        |  round((SELECT sum(term) FROM terms), 6) AS psi_total
        |FROM terms ORDER BY b""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(least(floor(col("value") / 50).cast("long"), lit(9L)).as("b"),
          when(col("user_id") % 2 === 0, lit(1L)).otherwise(lit(0L)).as("isa"))
      val g = e.groupBy(col("b"))
        .agg(sum(col("isa")).as("ca"), sum(lit(1L) - col("isa")).as("cb"))
      val n = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val p = g.crossJoin(broadcast(n))
        .select(col("b"),
          (when(col("ca") === 0, lit(0.5)).otherwise(col("ca").cast("double"))
            / col("na").cast("double")).as("pa"),
          (when(col("cb") === 0, lit(0.5)).otherwise(col("cb").cast("double"))
            / col("nb").cast("double")).as("pb"))
      val terms = p.select(col("b"), col("pa"), col("pb"),
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 9).as("term"))
      val total = terms.agg(round(sum(col("term")), 6).as("psi_total"))
      terms.crossJoin(broadcast(total)).orderBy(col("b"))
    },

    // ---- gradient-descent training rounds (stochasticLinearRegression
    //      parity, deterministic full-batch form) ----
    // Three GD rounds fitting price ≈ w·quantity + b on normalized
    // lineitem columns — the TRAINING-step shape (ClickHouse's
    // stochasticLinearRegression aggregate), distinct from q173's
    // closed-form regr_*. Determinism is the q125 power-iteration
    // discipline verbatim: each round's gradient sums run through
    // per-row DECIMAL(38,12) quantization (partial-agg order cannot
    // wiggle a bit), the (w, b) state re-enters the next round
    // 9dp-rounded, and the whole 3-round chain is oracle-checked with
    // zero driver arithmetic (the driver only transports Spark's own
    // rounded doubles back in as literals — the q125 direction-fold;
    // the oracle chains the same rounds as CTEs). Scale shape per
    // round: one map-side-combined aggregate over the ONE cached
    // (x, y) projection — nothing shuffles, and at 100 TB a persisted
    // projection beats re-reading parquet every round; mini-batching
    // is a WHERE on a hash of the row id.
    Q("q210_gd_linreg", {
      val rounds = (1 to 3).map { k =>
        s"""g$k AS (SELECT
           |    sum(CAST(x * (w * x + b - y) AS DECIMAL(38,12))) AS gw,
           |    sum(CAST(w * x + b - y AS DECIMAL(38,12))) AS gb,
           |    count(*) AS n
           |  FROM d, s${k - 1}),
           |s$k AS (SELECT
           |    round(w - 0.5 * CAST(gw AS DOUBLE) / n, 9) AS w,
           |    round(b - 0.5 * CAST(gb AS DOUBLE) / n, 9) AS b
           |  FROM g$k, s${k - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT CAST(l_quantity AS DOUBLE) / 50 AS x,
         |    CAST(l_extendedprice AS DOUBLE) / 100000 AS y
         |  FROM lineitem),
         |s0 AS (SELECT CAST(0.0 AS DOUBLE) AS w, CAST(0.0 AS DOUBLE) AS b),
         |$rounds,
         |m AS (SELECT sum(CAST(pow(w * x + b - y, 2) AS DECIMAL(38,12))) AS sq,
         |    count(*) AS n
         |  FROM d, s3)
         |SELECT w, b, round(CAST(sq AS DOUBLE) / n, 6) AS mse,
         |  CAST(n AS BIGINT) AS n
         |FROM s3, m""".stripMargin
    }) { (s, dir) =>
      // One corpus scan total: the (x, y) projection is registry-cached
      // (at 100 TB a persisted projection beats 4 parquet passes), and the
      // loop folds the 1-row state back in per round the q125 power-
      // iteration way — the driver transports Spark's own 9dp-rounded
      // doubles (zero driver arithmetic), so the chain is bit-identical to
      // the old nested-plan form while keeping every round's plan SHALLOW
      // (the nested form re-embedded the prior round's plan twice per
      // round — exponential Catalyst planning cost by round 8, see q267:
      // ~9 s of pure planning for <1 task-second of work).
      // The explicit repartition before persist matters twice over: a
      // small projection cached off a 1-split scan would make every round
      // single-threaded (and Spark's in-memory columnar scan is ~3× the
      // per-row cost of the vectorized parquet reader — measured r2
      // task 2.5 s vs 0.9 s here without it), and `repartition(n)` is
      // immune to AQE re-coalescing the cached plan's output to 1
      // partition (`canChangeCachedPlanOutputPartitioning=true` bit this
      // exact loop once — see the parity-traps note in SCALE.md).
      // parts/4 (floor 8): every round launches one task per cached
      // partition, and at the full shuffle.partitions width the ~50 ms
      // fixed task cost dominated the 19k-row partitions (q267's 8 rounds
      // measured 63 task-s for <10 s of work); a real cluster raises
      // shuffle.partitions with the data, so the ratio keeps rounds wide
      // there while local rounds stop paying 32 near-empty tasks each.
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val d = CacheRegistry.cache(s, s"gd-lineitem-xy:$dir") {
        t(s, dir, "lineitem")
          .select((col("l_quantity").cast("double") / 50).as("x"),
            (col("l_extendedprice").cast("double") / 100000).as("y"))
          .repartition(math.max(8, parts / 4))
      }
      val dec = "decimal(38,12)"
      // State re-enters each round as a 1-row broadcast frame rather than
      // inlined literals: literals bake into the generated source, so each
      // round would compile AND cold-run a fresh codegen class over the
      // corpus (measured ~1 s/round vs a ~0.4 s warm floor); as broadcast
      // ATTRIBUTES the corpus stage's generated code is byte-identical
      // every round — one compiled class, JIT-warm from round 2.
      var w = 0.0; var b = 0.0
      def stFrame = s.range(1).select(lit(w).as("w"), lit(b).as("b"))
      def resid = col("w") * col("x") + col("b") - col("y")
      for (_ <- 1 to 3) {
        val r = d.crossJoin(broadcast(stFrame))
          .agg(sum((col("x") * resid).cast(dec)).as("gw"),
            sum(resid.cast(dec)).as("gb"), count(lit(1)).as("n"))
          .select(
            round(lit(w) - lit(0.5) * col("gw").cast("double") / col("n"), 9)
              .as("w"),
            round(lit(b) - lit(0.5) * col("gb").cast("double") / col("n"), 9)
              .as("b"))
          .head()
        w = r.getDouble(0); b = r.getDouble(1)
      }
      d.crossJoin(broadcast(stFrame))
        .agg(sum(pow(resid, 2).cast(dec)).as("sq"), count(lit(1)).as("n"))
        .select(lit(w).as("w"), lit(b).as("b"),
          round(col("sq").cast("double") / col("n"), 6).as("mse"),
          col("n").cast("long").as("n"))
    },

    // ---- logistic-regression GD rounds (stochasticLogisticRegression
    //      parity) ----
    // q210's loop with a sigmoid residual, predicting purchase from the
    // normalized score. The extra hazard over q210, handled explicitly:
    // exp() is NOT bit-portable across libm implementations (the q208
    // ln() lesson), so the per-row sigmoid is rounded to 6dp BEFORE the
    // DECIMAL(38,12) gradient quantization — a 1-ulp exp() divergence
    // flips a 6dp rounding only within ~2 ulp of a half-way point
    // (~2e-10 per row per round; ~4e-4 expected flips across the whole
    // 3-round suite at sf0.1). Everything else is the q125/q210
    // discipline: exact quantized gradient sums, 9dp state re-entry,
    // zero driver arithmetic, oracle rounds generated by the same loop.
    // Output: the trained (w, b), exact threshold-0.5 accuracy counts
    // (integer — the rounded sigmoids compare identically), and the
    // mean log-loss (per-row 6dp-rounded ln terms, exact DECIMAL mean).
    Q("q211_gd_logreg", {
      val rounds = (1 to 3).map { k =>
        s"""p$k AS (SELECT x, y,
           |    round(1.0 / (1.0 + exp(-(w * x + b))), 6) AS p
           |  FROM d, s${k - 1}),
           |g$k AS (SELECT
           |    sum(CAST(x * (p - y) AS DECIMAL(38,12))) AS gw,
           |    sum(CAST(p - y AS DECIMAL(38,12))) AS gb,
           |    count(*) AS n
           |  FROM p$k),
           |s$k AS (SELECT
           |    round(w - 2.0 * CAST(gw AS DOUBLE) / n, 9) AS w,
           |    round(b - 2.0 * CAST(gb AS DOUBLE) / n, 9) AS b
           |  FROM g$k, s${k - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT CAST(value AS DOUBLE) / 500 AS x,
         |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
         |  FROM events),
         |s0 AS (SELECT CAST(0.0 AS DOUBLE) AS w, CAST(0.0 AS DOUBLE) AS b),
         |$rounds,
         |pf AS (SELECT x, y, p,
         |    least(greatest(p, 0.000001), 0.999999) AS pc
         |  FROM (SELECT x, y,
         |      round(1.0 / (1.0 + exp(-(w * x + b))), 6) AS p
         |    FROM d, s3)),
         |m AS (SELECT
         |    sum(CASE WHEN (p > 0.5) = (y = 1.0) THEN 1 ELSE 0 END) AS correct,
         |    sum(CAST(round(-(y * ln(pc) + (1 - y) * ln(1 - pc)), 6)
         |        AS DECIMAL(38,12))) AS ll,
         |    count(*) AS n
         |  FROM pf)
         |SELECT w, b, CAST(correct AS BIGINT) AS correct,
         |  CAST(n AS BIGINT) AS n,
         |  round(CAST(ll AS DOUBLE) / n, 6) AS logloss
         |FROM s3, m""".stripMargin
    }) { (s, dir) =>
      // Same cached-projection + literal-folded state as q210 (scaladoc
      // there); the sigmoid/clamp semantics are untouched.
      val d = CacheRegistry.cache(s, s"gd-events-xy:$dir") {
        t(s, dir, "events")
          .select((col("value").cast("double") / 500).as("x"),
            when(col("event_type") === "purchase", lit(1.0)).otherwise(lit(0.0))
              .as("y"))
          .repartition(math.max(8, s.conf.get("spark.sql.shuffle.partitions").toInt / 4))
      }
      val dec = "decimal(38,12)"
      // broadcast-frame state for codegen-class reuse across rounds — the
      // q210 note
      var w = 0.0; var b = 0.0
      def stFrame = s.range(1).select(lit(w).as("w"), lit(b).as("b"))
      def sig = round(lit(1.0) / (lit(1.0)
        + exp(-(col("w") * col("x") + col("b")))), 6)
      for (_ <- 1 to 3) {
        val r = d.crossJoin(broadcast(stFrame)).withColumn("p", sig)
          .agg(
            sum((col("x") * (col("p") - col("y"))).cast(dec)).as("gw"),
            sum((col("p") - col("y")).cast(dec)).as("gb"),
            count(lit(1)).as("n"))
          .select(
            round(lit(w) - lit(2.0) * col("gw").cast("double") / col("n"), 9)
              .as("w"),
            round(lit(b) - lit(2.0) * col("gb").cast("double") / col("n"), 9)
              .as("b"))
          .head()
        w = r.getDouble(0); b = r.getDouble(1)
      }
      // Clamp the 6dp-rounded sigmoid away from {0, 1} before the ln
      // terms: at exactly 0/1 Spark's log() returns NULL (silently
      // dropped from the sum) while DuckDB's ln() returns -inf — a
      // data-dependent divergence (ADVICE r9). The clamp is stated
      // identically in the oracle, so both engines see the same pc.
      val pf = d.crossJoin(broadcast(stFrame)).withColumn("p", sig)
        .withColumn("pc", least(greatest(col("p"), lit(1e-6)), lit(0.999999)))
      pf.agg(
          sum(when((col("p") > 0.5) === (col("y") === 1.0), lit(1))
            .otherwise(lit(0))).as("correct"),
          sum(round(-(col("y") * log(col("pc"))
            + (lit(1) - col("y")) * log(lit(1) - col("pc"))), 6).cast(dec))
            .as("ll"),
          count(lit(1)).as("n"))
        .select(lit(w).as("w"), lit(b).as("b"),
          col("correct").cast("long").as("correct"),
          col("n").cast("long").as("n"),
          round(col("ll").cast("double") / col("n"), 6).as("logloss"))
    },

    // ---- precision-recall curve summary: average precision + best F1 ----
    // The PR twin of q206's ROC, the metric that matters when positives
    // are rare (a filter pass over a 100 TB corpus keeps a sliver).
    // Same machinery: one hash aggregate to the distinct-score frame,
    // BOTH prefix sums in one stitch, then per-threshold exact rational
    // identities — precision = tp/k, recall = tp/np, F1 = 2·tp/(k+np).
    // AP needs no lag: descending past score v adds pos_v/np recall, so
    // AP = Σ_v (pos_v/np)·precision_v — each term quantizes at 9 dp into
    // DECIMAL (the q239 order-immunity rule) and sums exactly. Best F1
    // rounds at 9 dp first, and its threshold is the MIN score attaining
    // the max — a stated tiebreak, not an engine argmax.
    Q("q255_pr_curve",
      """WITH e AS (SELECT value AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (SELECT v, count(*) AS cnt, sum(y) AS pos FROM e GROUP BY 1),
        |r AS (SELECT v, cnt, pos,
        |    sum(cnt) OVER wo AS cumt, sum(pos) OVER wo AS cump
        |  FROM g
        |  WINDOW wo AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |n AS (SELECT sum(pos) AS np, sum(cnt) AS tot,
        |    count(*) AS nthr FROM g),
        |pts AS (SELECT v,
        |    np - cump + pos AS tp,
        |    tot - cumt + cnt AS k,
        |    pos, np
        |  FROM r, n),
        |terms AS (SELECT v,
        |    CAST(round((CAST(pos AS DOUBLE) / np)
        |      * (CAST(tp AS DOUBLE) / k), 9) AS DECIMAL(28,9)) AS term,
        |    round(2.0 * tp / (k + np), 9) AS f19
        |  FROM pts),
        |ap AS (SELECT sum(term) AS ap_sum FROM terms),
        |bf AS (SELECT max(f19) AS best_f1 FROM terms),
        |bt AS (SELECT min(v) AS best_thr FROM terms, bf
        |  WHERE f19 = best_f1)
        |SELECT CAST(np AS BIGINT) AS n_pos,
        |  CAST(tot - np AS BIGINT) AS n_neg,
        |  CAST(nthr AS BIGINT) AS n_thresholds,
        |  round(CAST(ap_sum AS DOUBLE), 6) AS avg_precision,
        |  round(best_f1, 6) AS best_f1, best_thr
        |FROM n, ap, bf, bt""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("value").as("v"),
          when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)).as("y"))
      // the distinct-score frame feeds the stitch, the totals, and the
      // term folds — registry-cached, one corpus scan (the q248 pattern)
      val g = CacheRegistry.cache(s, s"q255-scores:$dir") {
        e.groupBy(col("v"))
          .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      }
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val cums = Skew.globalRunningSums(g, Seq(col("v")),
        Seq(col("cnt") -> "cumt", col("pos") -> "cump"), parts)
      val n = g.agg(sum(col("pos")).as("np"), sum(col("cnt")).as("tot"),
        count(lit(1)).as("nthr"))
      val pts = cums.crossJoin(broadcast(n))
        .select(col("v"),
          (col("np") - col("cump") + col("pos")).as("tp"),
          (col("tot") - col("cumt") + col("cnt")).as("k"),
          col("pos"), col("np"))
      val terms = pts.select(col("v"),
        round((col("pos").cast("double") / col("np"))
          * (col("tp").cast("double") / col("k")), 9)
          .cast("decimal(28,9)").as("term"),
        round(lit(2.0) * col("tp") / (col("k") + col("np")), 9).as("f19"))
      // AP and max-F1 fold in ONE aggregate; only the stated-tiebreak
      // threshold lookup needs the second pass over the tiny term frame
      val stats = terms.agg(sum(col("term")).as("ap_sum"),
        max(col("f19")).as("best_f1"))
      val bt = terms.crossJoin(broadcast(stats))
        .filter(col("f19") === col("best_f1"))
        .agg(min(col("v")).as("best_thr"))
      n.crossJoin(broadcast(stats)).crossJoin(broadcast(bt))
        .select(col("np").cast("long").as("n_pos"),
          (col("tot") - col("np")).cast("long").as("n_neg"),
          col("nthr").cast("long").as("n_thresholds"),
          round(col("ap_sum").cast("double"), 6).as("avg_precision"),
          round(col("best_f1"), 6).as("best_f1"), col("best_thr"))
    },

    // ---- quantile-regression GD rounds (pinball / check loss, τ=0.9) ----
    // The robust-regression sibling of q210: fit the CONDITIONAL 0.9-
    // quantile line price ≈ w·qty + b by subgradient descent on the
    // pinball loss. Per-row subgradient is the two-valued step
    // (pred ≥ y → 1−τ, else −τ; the tie assigned to the ≥ branch so both
    // engines pick the same side), which makes this loop FULLY
    // deterministic — no exp/ln anywhere, so unlike q211 there is no
    // rounded-transcendental hazard at all: preds are identical doubles
    // from the 9dp state, comparisons are exact, and the quantized
    // DECIMAL(38,12) gradient sums are order-immune. Output: (w, b),
    // empirical coverage P(y ≤ pred) — which GD drives toward τ — and
    // the mean pinball loss. Scale: q210's shape — per round one
    // map-side-combined aggregate over the one cached (x, y) frame.
    Q("q267_quantile_regression", {
      val rounds = (1 to 8).map { k =>
        s"""g$k AS (SELECT
           |    sum(CAST(x * (CASE WHEN w * x + b >= y THEN 0.1 ELSE -0.9 END)
           |        AS DECIMAL(38,12))) AS gw,
           |    sum(CAST((CASE WHEN w * x + b >= y THEN 0.1 ELSE -0.9 END)
           |        AS DECIMAL(38,12))) AS gb,
           |    count(*) AS n
           |  FROM d, s${k - 1}),
           |s$k AS (SELECT
           |    round(w - 0.5 * CAST(gw AS DOUBLE) / n, 9) AS w,
           |    round(b - 0.5 * CAST(gb AS DOUBLE) / n, 9) AS b
           |  FROM g$k, s${k - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT CAST(l_quantity AS DOUBLE) / 50 AS x,
         |    CAST(l_extendedprice AS DOUBLE) / 100000 AS y
         |  FROM lineitem),
         |s0 AS (SELECT CAST(0.0 AS DOUBLE) AS w, CAST(0.0 AS DOUBLE) AS b),
         |$rounds,
         |m AS (SELECT
         |    sum(CASE WHEN y <= w * x + b THEN 1 ELSE 0 END) AS covered,
         |    sum(CAST(round(CASE WHEN w * x + b >= y
         |          THEN 0.1 * (w * x + b - y)
         |          ELSE 0.9 * (y - (w * x + b)) END, 9)
         |        AS DECIMAL(38,12))) AS pb,
         |    count(*) AS n
         |  FROM d, s8)
         |SELECT w, b,
         |  round(CAST(covered AS DOUBLE) / n, 6) AS coverage,
         |  round(CAST(pb AS DOUBLE) / n, 6) AS pinball,
         |  CAST(n AS BIGINT) AS n
         |FROM s8, m""".stripMargin
    }) { (s, dir) =>
      // Cached projection + literal-folded state (the q210 scaladoc): at
      // 8 rounds the nested-plan form embedded the prior round's plan
      // twice per round — a 2^8 Catalyst tree that cost ~9 s of pure
      // planning for <1 task-second of work. Shallow per-round plans over
      // the one cached (x, y) frame keep the chain bit-identical (the
      // driver transports Spark's own 9dp-rounded doubles) and drop the
      // wall to the actual aggregate cost.
      val d = CacheRegistry.cache(s, s"gd-lineitem-xy:$dir") {
        t(s, dir, "lineitem")
          .select((col("l_quantity").cast("double") / 50).as("x"),
            (col("l_extendedprice").cast("double") / 100000).as("y"))
          .repartition(math.max(8, s.conf.get("spark.sql.shuffle.partitions").toInt / 4))
      }
      val dec = "decimal(38,12)"
      // broadcast-frame state for codegen-class reuse across rounds — the
      // q210 note (at 8 rounds a fresh cold class per round dominated)
      var w = 0.0; var b = 0.0
      def stFrame = s.range(1).select(lit(w).as("w"), lit(b).as("b"))
      def pred = col("w") * col("x") + col("b")
      def gmult = when(pred >= col("y"), lit(0.1)).otherwise(lit(-0.9))
      for (_ <- 1 to 8) {
        val r = d.crossJoin(broadcast(stFrame))
          .agg(sum((col("x") * gmult).cast(dec)).as("gw"),
            sum(gmult.cast(dec)).as("gb"), count(lit(1)).as("n"))
          .select(
            round(lit(w) - lit(0.5) * col("gw").cast("double") / col("n"), 9)
              .as("w"),
            round(lit(b) - lit(0.5) * col("gb").cast("double") / col("n"), 9)
              .as("b"))
          .head()
        w = r.getDouble(0); b = r.getDouble(1)
      }
      d.crossJoin(broadcast(stFrame))
        .agg(sum(when(col("y") <= pred, 1L).otherwise(0L)).as("covered"),
          sum(round(when(pred >= col("y"), lit(0.1) * (pred - col("y")))
            .otherwise(lit(0.9) * (col("y") - pred)), 9).cast(dec)).as("pb"),
          count(lit(1)).as("n"))
        .select(lit(w).as("w"), lit(b).as("b"),
          round(col("covered").cast("double") / col("n"), 6).as("coverage"),
          round(col("pb").cast("double") / col("n"), 6).as("pinball"),
          col("n").cast("long").as("n"))
    }
  )
}
