package graft.ops


import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Remaining SURVEY.md §2.2 surface: predicate algebra, HLL sketches,
  * map functions, generator (UDTF) expressions, Scala UDF registration,
  * pivot, sampling, and RANGE window frames. */
object Extras {

  /** q82's text, used verbatim as both the oracle and the Spark query
    * (the dialect is common to both engines) — one definition so an edit
    * cannot desynchronize the oracle from the query under test. */
  private val Q82Sql =
    """SELECT o_orderkey,
      |  round(o_totalprice / (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |                               / count(*) FROM orders), 6) AS price_vs_avg,
      |  o_custkey IN (SELECT c_custkey FROM customer
      |                WHERE c_mktsegment = 'BUILDING') AS is_building,
      |  EXISTS (SELECT 1 FROM lineitem
      |          WHERE l_orderkey = o_orderkey AND l_quantity >= 48) AS has_bulk
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- full predicate algebra: isin / like / rlike / between / null ----
    Q("q51_predicates",
      """SELECT p_partkey,
        |  (p_brand IN ('Brand#1', 'Brand#5', 'Brand#9')) AS in_set,
        |  (p_name LIKE '%bolt%') AS has_bolt,
        |  regexp_matches(p_name, '^(red|blue) ') AS color_start,
        |  (p_size BETWEEN 10 AND 20) AS mid_size,
        |  (p_retailprice IS NOT NULL) AS has_price,
        |  (NOT (p_type = 'PROMO') AND (p_size > 25 OR p_brand = 'Brand#3')) AS compound
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
          col("p_partkey"),
          col("p_brand").isin("Brand#1", "Brand#5", "Brand#9").as("in_set"),
          col("p_name").like("%bolt%").as("has_bolt"),
          col("p_name").rlike("^(red|blue) ").as("color_start"),
          col("p_size").between(10, 20).as("mid_size"),
          col("p_retailprice").isNotNull.as("has_price"),
          (!(col("p_type") === "PROMO") && (col("p_size") > 25 || col("p_brand") === "Brand#3"))
            .as("compound"))
        .orderBy(col("p_partkey"))
    },

    // ---- HLL sketch: approx_count_distinct ----
    // Inherently engine-specific estimates → no SQL oracle (driver records
    // the weaker rows-only check); exact twins live in q11_agg_distinct.
    Q.rowsOnly("q52_approx_distinct") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"))
        .orderBy(col("l_returnflag"))
    },

    // ---- map construction + access functions ----
    // The map ops must round-trip real values: m[k] and map_keys/values
    // land in scalar output columns the oracle states directly.
    Q("q53_map_funcs",
      """SELECT o_orderkey,
        |  o_orderstatus AS first_key,
        |  o_totalprice AS status_val,
        |  CAST(1 AS INTEGER) AS n_keys,
        |  o_orderpriority AS via_entries
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val m = map(col("o_orderstatus"), col("o_totalprice"))
      t(s, dir, "orders").select(
          col("o_orderkey"),
          element_at(map_keys(m), 1).as("first_key"),
          element_at(m, col("o_orderstatus")).as("status_val"),
          size(m).as("n_keys"),
          element_at(map_values(
            map_from_entries(array(struct(lit("p"), col("o_orderpriority"))))), 1)
            .as("via_entries"))
        .orderBy(col("o_orderkey"))
    },

    // ---- generator expressions: posexplode over array slices ----
    Q("q54_generators",
      """SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
        |  round(CAST(embedding[i] AS DOUBLE), 6) AS val
        |FROM embeddings, range(1, 4) t(i)
        |ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 3)))
        .select(col("vec_id"), col("pos"),
          round(col("col").cast("double"), 6).as("val"))
        .orderBy(col("vec_id"), col("pos"))
    },

    // ---- registered Scala UDF surface ----
    // (For anything hot, a native expression is preferred — see
    // SnappyDecode — but the plain UDF path must exist and work.)
    Q("q55_scala_udf",
      """SELECT o_orderkey,
        |  round(o_totalprice * 0.1 + 5.0, 4) AS fee
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val fee = udf((p: Double) => p * 0.1 + 5.0)
      s.udf.register("graft_fee", fee)
      t(s, dir, "orders")
        .select(col("o_orderkey"), round(fee(col("o_totalprice")), 4).as("fee"))
        .orderBy(col("o_orderkey"))
    },

    // ---- pivot (status → columns) ----
    // Exact decimal sums, one final cast to DOUBLE per pivot column so the
    // output types hash-match the oracle (see Relational.sumD rationale).
    Q("q56_pivot",
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- seeded sampling ----
    // Spark's sampler (XORShift per partition) is reproducible for a fixed
    // seed+partitioning but not portable to DuckDB → rows-only check.
    Q.rowsOnly("q57_sample") { (s, dir) =>
      t(s, dir, "lineitem")
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // ---- deterministic hash sample (oracle-checkable sampling twin) ----
    // q57/q70 use Spark's seeded RNG (not portable to DuckDB → rows-only);
    // this variant samples by content hash — md5 of the key is identical in
    // both engines, so the ~10% sample (first hex byte < 0x1a ≈ 26/256) is
    // exactly reproducible and fully hash-checked. At scale this is also the
    // *better* sampling operator: deterministic, partition-independent, and
    // stable across retries/re-runs (a property seeded RNG sampling lacks,
    // since Spark's sampler depends on partitioning).
    Q("q71_hash_sample",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(substring(md5(concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))), 1, 2) < "1a")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },

    // ---- RANGE window frame + first/last value ----
    Q("q58_window_range",
      """SELECT o_custkey, o_orderkey,
        |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_similar,
        |  first_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS first_order,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      // Double-valued RANGE offsets have no Scala WindowSpec API (removed in
      // Spark 3.0) — the SQL window expression form supports them.
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          expr("""count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 |RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW)""".stripMargin)
            .cast("long").as("n_similar"),
          first(col("o_orderkey")).over(byDate).as("first_order"),
          last(col("o_orderkey"))
            .over(byDate.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("last_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- scalable global rank, oracle-checked at the query level ----
    // Skew.globalRowNumber (range-bucket + prefix-sum stitch) must produce
    // exactly what a single-partition row_number() window would — proven
    // here against the oracle's window, over a fact table, with no
    // SinglePartition exchange in the Spark plan (ScaleTechniquesSpec
    // asserts the plan shape; this query proves the values).
    Q("q75_scalable_rank",
      """SELECT l_orderkey, l_linenumber, rn FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(row_number() OVER (ORDER BY l_extendedprice DESC,
        |      l_orderkey, l_linenumber) AS BIGINT) AS rn
        |  FROM lineitem)
        |WHERE rn <= 1000
        |ORDER BY rn""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      graft.ops.Skew.globalRowNumber(base,
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
          numPartitions = s.conf.get("spark.sql.shuffle.partitions").toInt)
        .filter(col("rn") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
        .orderBy(col("rn"))
    },

    // ---- window battery 2: percent_rank / cume_dist / nth_value ----
    Q("q76_window_misc",
      """SELECT o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  nth_value(o_orderkey, 3) OVER w AS third_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").select(
          col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
        .orderBy(col("o_orderkey"))
    },

    // ---- scalar battery 2: edit distance, bitwise, conditionals ----
    Q("q77_scalar_misc",
      """SELECT p_partkey,
        |  CAST(levenshtein(p_brand, p_type) AS INTEGER) AS edit_dist,
        |  greatest(p_size, 25) AS hi,
        |  least(p_size, 25) AS lo,
        |  nullif(p_type, 'PROMO') AS type_or_null,
        |  coalesce(nullif(p_type, 'PROMO'), 'was-promo') AS type_filled,
        |  p_size & 7 AS low_bits,
        |  p_size << 2 AS shifted,
        |  reverse(p_brand) AS rev_brand,
        |  repeat(p_brand, 2) AS twice
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
          col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).as("edit_dist"),
          greatest(col("p_size"), lit(25)).as("hi"),
          least(col("p_size"), lit(25)).as("lo"),
          nullif(col("p_type"), lit("PROMO")).as("type_or_null"),
          coalesce(nullif(col("p_type"), lit("PROMO")), lit("was-promo")).as("type_filled"),
          expr("p_size & 7").as("low_bits"),
          expr("shiftleft(p_size, 2)").as("shifted"),
          reverse(col("p_brand")).as("rev_brand"),
          repeat(col("p_brand"), 2).as("twice"))
        .orderBy(col("p_partkey"))
    },

    // ---- join-strategy hints: same answer under forced physical plans ----
    // The hint surface a tuning user reaches for when the optimizer's
    // choice is wrong: the identical aggregate is computed once under a
    // SHUFFLE_HASH hint and once under MERGE (sort-merge), labeled per
    // strategy — results must be plan-invariant (PlanShapeSpec asserts the
    // hints actually take effect in the physical plan).
    Q("q81_join_hints",
      """WITH agg AS (
        |  SELECT o_orderstatus, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_orderstatus)
        |SELECT 'merge' AS strategy, o_orderstatus, n, sum_qty FROM agg
        |UNION ALL
        |SELECT 'shuffle_hash' AS strategy, o_orderstatus, n, sum_qty FROM agg
        |ORDER BY strategy, o_orderstatus""".stripMargin) { (s, dir) =>
      def leg(hint: String) = {
        val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        l.join(o.hint(hint), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .select(lit(if (hint == "merge") "merge" else "shuffle_hash").as("strategy"),
            col("o_orderstatus"), col("n"), col("sum_qty"))
      }
      leg("merge").unionByName(leg("shuffle_hash"))
        .orderBy(col("strategy"), col("o_orderstatus"))
    },

    // ---- subquery battery: scalar, IN, correlated EXISTS ----
    // Catalyst decorrelates these into joins (RewritePredicateSubquery /
    // scalar-subquery broadcast) — free per SURVEY §4.1; this query proves
    // the SQL surface end-to-end. The scalar denominator is an exact
    // decimal sum ÷ count so both engines derive a bit-identical double.
    Q("q82_subqueries", Q82Sql) { (s, dir) =>
      graft.schema.Tables.views(s, dir)
      s.sql(Q82Sql)
    },

    // ---- null / NaN semantics battery ----
    // The SQL three-valued-logic corners that silently corrupt pipelines:
    // null-safe equality (<=> ≙ IS NOT DISTINCT FROM), nvl2 presence
    // dispatch, IEEE NaN detection and replacement. NaN is injected as a
    // literal — Spark's ANSI mode (default in 4.x) traps even double
    // division by zero, unlike DuckDB's IEEE 0.0/0.0.
    Q("q83_null_semantics",
      """SELECT p_partkey,
        |  (nullif(p_type, 'PROMO') IS NOT DISTINCT FROM 'STANDARD') AS nse_std,
        |  (nullif(p_type, 'PROMO') IS NOT DISTINCT FROM NULL) AS nse_null,
        |  CASE WHEN nullif(p_type, 'PROMO') IS NOT NULL THEN 'has' ELSE 'none' END AS presence,
        |  isnan(CASE WHEN p_size % 2 = 0 THEN CAST('NaN' AS DOUBLE) ELSE p_retailprice END) AS is_nan,
        |  round(CASE WHEN isnan(CASE WHEN p_size % 2 = 0 THEN CAST('NaN' AS DOUBLE) ELSE p_retailprice END)
        |        THEN -1.0
        |        ELSE CASE WHEN p_size % 2 = 0 THEN CAST('NaN' AS DOUBLE) ELSE p_retailprice END END, 2) AS nan_fixed
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val a = nullif(col("p_type"), lit("PROMO"))
      val x = when(col("p_size") % 2 === 0, lit(Double.NaN))
        .otherwise(col("p_retailprice"))
      t(s, dir, "part").select(
          col("p_partkey"),
          (a <=> lit("STANDARD")).as("nse_std"),
          (a <=> lit(null)).as("nse_null"),
          nvl2(a, lit("has"), lit("none")).as("presence"),
          isnan(x).as("is_nan"),
          round(nanvl(x, lit(-1.0)), 2).as("nan_fixed"))
        .orderBy(col("p_partkey"))
    },

    // ---- grouping flags over ROLLUP (subtotal-row introspection) ----
    Q("q69_grouping_flags",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      graft.schema.Tables.t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("n"))
        .orderBy(col("g_rf"), col("g_ls"),
          asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // ---- stratified sampling (per-key fractions) ----
    // Seeded but Spark-RNG-specific → rows-only check, like q57.
    Q.rowsOnly("q70_stratified_sample") { (s, dir) =>
      graft.schema.Tables.t(s, dir, "documents")
        .stat.sampleBy("lang",
          Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.1),
          42L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"))
    },

    // ---- unpivot / melt (inverse of q56's pivot) ----
    Q("q68_unpivot",
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin) { (s, dir) =>
      graft.schema.Tables.t(s, dir, "part")
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size").cast("double").as("p_size")),
          "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))
    },

    // ---- VARIANT semi-structured type (Spark 4) ----
    // parse_json → VariantType → typed extraction; the output column is a
    // plain int so the oracle (and the parquet dump) stay engine-neutral.
    Q("q60_variant_json",
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER) AS k_variant
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      graft.schema.Tables.t(s, dir, "events")
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k_variant"))
        .orderBy(col("event_id"))
    },

    // ---- S8 row encode: to_json / to_csv, plus the reference's exact
    //      quote-wrap CSV contract (converter.go:73-81) for bug-compat ----
    Q("q61_row_encode",
      """SELECT l_orderkey, l_linenumber,
        |  '{"k":' || l_orderkey || ',"n":' || l_linenumber || '}' AS js,
        |  l_orderkey || ',' || l_linenumber AS cs,
        |  '"' || l_returnflag || '","' || l_linestatus || '"' AS ref_csv
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      graft.schema.Tables.t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          to_json(struct(col("l_orderkey").as("k"), col("l_linenumber").as("n"))).as("js"),
          to_csv(struct(col("l_orderkey"), col("l_linenumber"))).as("cs"),
          concat(lit("\""), col("l_returnflag"), lit("\",\""), col("l_linestatus"), lit("\""))
            .as("ref_csv"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- window battery 3: lag/lead/last_value with IGNORE NULLS ----
    // Gap-filling over a sparse column — carry the last known value
    // forward within a partition (the sensor/price backfill idiom). The
    // window keys on o_custkey (high-cardinality), so it parallelizes like
    // q18; the sparse column is manufactured (F-status prices) so the
    // NULL-skipping is genuinely exercised. DuckDB spells the modifier
    // inside the call — lag(x IGNORE NULLS) — Spark's DataFrame overload
    // takes ignoreNulls = true.
    Q("q103_window_ignore_nulls",
      """WITH b AS (SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DOUBLE) END AS px
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, px,
        |  lag(px IGNORE NULLS) OVER w AS prev_px,
        |  last_value(px IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_px
        |FROM b
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.schema.Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderstatus") === "F", col("o_totalprice").cast("double")).as("px"))
        .select(col("o_orderkey"), col("o_custkey"), col("px"),
          lag(col("px"), 1, null, ignoreNulls = true).over(w).as("prev_px"),
          last(col("px"), ignoreNulls = true).over(wf).as("filled_px"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- salted hot-key join, oracle-checked at the query level ----
    // Skew.saltedJoin spreads a dominant join key across `buckets`
    // reducers (left salted by a discriminator hash, right replicated per
    // salt) — the mitigation for the one-reducer-gets-the-world shape AQE
    // can't always split. The oracle is the PLAIN join: salting must be
    // invisible in the result, and this query proves it against DuckDB
    // the way q100 proves the shingle cap (skew paths are oracle-checked,
    // not just unit-tested).
    Q("q105_salted_join",
      """SELECT l_orderkey, o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey, o_orderstatus
        |ORDER BY l_orderkey, o_orderstatus""".stripMargin) { (s, dir) =>
      val li = graft.schema.Tables.t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val o = graft.schema.Tables.t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.ops.Skew.saltedJoin(li, o, "l_orderkey", "l_linenumber", buckets = 8)
        .groupBy(col("l_orderkey"), col("o_orderstatus"))
        .agg(count(lit(1)).cast("long").as("n_lines"),
          sum(col("l_quantity")).cast("double").as("sum_qty"))
        .orderBy(col("l_orderkey"), col("o_orderstatus"))
    },

    // ---- bounded ordered collect (groupArray(N) / groupArraySorted
    //      parity) ----
    // ClickHouse's groupArray(N) keeps at most N elements per group;
    // groupArraySorted(N) keeps the N smallest under a sort key. Stated
    // as one hash aggregate: collect_list of (sort-key, payload) structs,
    // array_sort (ascending struct order — acctbal NEGATED for the
    // descending rank, custkey tiebreak), slice to 5, project the
    // payload, render as the canonical comma string (the q171 rule). The
    // oracle uses DuckDB's ordered list() + list_slice. At 100 TB the
    // collect_list per group is the operator's semantics (bounded output
    // needs the full group's elements to pick the top N — same cost
    // shape as ClickHouse's own implementation); groups here are the
    // 5-value segment column, so the FINAL agg is 5 rows while the
    // partial aggs stay map-side-combined.
    Q("q185_group_array_bounded",
      """SELECT c_mktsegment,
        |  array_to_string(list_slice(
        |    list(c_name ORDER BY c_acctbal DESC, c_custkey), 1, 5), ',')
        |    AS top5_names,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          expr("""array_join(transform(
                 |  slice(array_sort(collect_list(
                 |    struct(-c_acctbal AS s, c_custkey AS k, c_name AS n))), 1, 5),
                 |  x -> x.n), ',')""".stripMargin).as("top5_names"),
          count(lit(1)).cast("long").as("n"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- calendar/time bucket floors (toStartOfFiveMinutes /
    //      toStartOfHour / toStartOfWeek parity) ----
    // ClickHouse's toStartOf* family as exact integer epoch arithmetic
    // (5-minute floor — no built-in truncation unit, so epoch_us DIV
    // 300e6 on both engines) and date_trunc (hour; week — both engines
    // start weeks on Monday). All under the pinned UTC session zone with
    // the q158 NTZ cast rule; DuckDB's to_timestamp returns TIMESTAMPTZ,
    // cast back to TIMESTAMP for schema parity. Buckets aggregate
    // map-side like any GROUP BY over a derived key.
    Q("q186_time_buckets",
      """SELECT CAST(to_timestamp((epoch_us(ts) // 300000000) * 300)
        |       AS TIMESTAMP) AS t5m,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS th,
        |  CAST(date_trunc('week', ts) AS TIMESTAMP) AS tw,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY t5m""".stripMargin) { (s, dir) =>
      val ts = col("ts").cast("timestamp")
      t(s, dir, "events")
        .select(
          timestamp_seconds((unix_micros(ts) / 300000000L).cast("long") * 300)
            .as("t5m"),
          date_trunc("hour", ts).as("th"),
          date_trunc("week", ts).as("tw"),
          col("user_id"))
        .groupBy(col("t5m"), col("th"), col("tw"))
        .agg(count(lit(1)).cast("long").as("n"),
          countDistinct(col("user_id")).cast("long").as("users"))
        .orderBy(col("t5m"))
    },

    // ---- bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) ----
    // q23 covers the DISTINCT forms; these are the multiset forms
    // (min(m,n) copies / m−n copies — the semantics dedup accounting
    // needs when duplicates are the signal). Spark plans both as
    // aggregate-rewritten joins — no row-by-row anything.
    Q("q189_set_ops_all",
      """WITH a AS (SELECT o_orderstatus AS s FROM orders
        |           WHERE o_totalprice > 50000),
        |b AS (SELECT o_orderstatus AS s FROM orders
        |      WHERE o_orderpriority = '1-URGENT')
        |SELECT 'intersect_all' AS op, s, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY s
        |UNION ALL
        |SELECT 'except_all' AS op, s, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY s
        |ORDER BY op, s""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 50000).select(col("o_orderstatus").as("s"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderstatus").as("s"))
      val ia = a.intersectAll(b).groupBy(col("s"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(lit("intersect_all").as("op"), col("s"), col("n"))
      val ea = a.exceptAll(b).groupBy(col("s"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(lit("except_all").as("op"), col("s"), col("n"))
      ia.unionByName(ea).orderBy(col("op"), col("s"))
    },

    // ---- map higher-order functions (transform_keys / transform_values
    //      / map_filter / map_zip_with) ----
    // The map-HOF quartet over q171's per-user type-count map, every
    // output rendered as the sorted canonical entry string (array_sort
    // over map_entries — immune to engine-internal map entry order, the
    // q171 rule). The oracle never builds a map: it states the expected
    // entries straight from the counts, which is the ground truth the
    // HOFs must reproduce.
    Q("q190_map_hof",
      """WITH c AS (SELECT user_id, event_type AS k,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  string_agg(k || ':' || (v * 2), ',' ORDER BY k) AS doubled,
        |  string_agg(CASE WHEN v >= 3 THEN k || ':' || v END, ',' ORDER BY k)
        |    AS big_only,
        |  string_agg(k || '_t:' || v, ',' ORDER BY k) AS keyed,
        |  string_agg(k || ':' || CASE WHEN v >= 3 THEN v ELSE 0 END,
        |             ',' ORDER BY k) AS zipped
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      def render(m: String): org.apache.spark.sql.Column =
        expr(s"""array_join(transform(array_sort(map_entries($m)),
                |  e -> concat(e.key, ':', CAST(e.value AS STRING))), ',')"""
          .stripMargin)
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .groupBy(col("user_id"))
        .agg(expr("""map_from_entries(array_sort(
                    |  collect_list(struct(event_type, cnt))))""".stripMargin).as("m"))
        .select(col("user_id"),
          render("transform_values(m, (k, v) -> v * 2)").as("doubled"),
          render("map_filter(m, (k, v) -> v >= 3)").as("big_only"),
          render("transform_keys(m, (k, v) -> concat(k, '_t'))").as("keyed"),
          render("""map_zip_with(m, map_filter(m, (k, v) -> v >= 3),
                   |  (k, v1, v2) -> coalesce(v2, CAST(0 AS BIGINT)))"""
            .stripMargin).as("zipped"))
        .orderBy(col("user_id"))
    },

    // ---- string battery 2 (initcap / translate / instr / overlay /
    //      reverse / repeat / ascii) ----
    // The remaining ClickHouse/ANSI string functions q24 didn't cover,
    // over the doc's first-3-word phrase. DuckDB lacks initcap and
    // overlay, so the oracle states both from first principles (per-word
    // upper-first/lower-rest; substring splice) — a second parser would
    // only hide deviations. One codegen'd projection.
    Q("q191_string_battery2",
      raw"""WITH p AS (SELECT doc_id,
           |    array_to_string((string_split_regex(lower(trim(text)), '\s+'))[1:3], ' ')
           |      AS ph
           |  FROM documents)
           |SELECT doc_id,
           |  array_to_string(list_transform(string_split(ph, ' '),
           |    w -> upper(w[1:1]) || lower(w[2:])), ' ') AS ic,
           |  translate(ph, 'aeiou', '12345') AS tr,
           |  CAST(instr(ph, 'a') AS BIGINT) AS pos_a,
           |  substr(ph, 1, 1) || 'XX' || substr(ph, 5) AS ov,
           |  reverse(ph) AS rev,
           |  repeat(substr(ph, 1, 2), 2) AS rep,
           |  CAST(ascii(ph) AS BIGINT) AS asc
           |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"), 1, 3)).as("ph"))
        .select(col("doc_id"),
          initcap(col("ph")).as("ic"),
          translate(col("ph"), "aeiou", "12345").as("tr"),
          instr(col("ph"), "a").cast("long").as("pos_a"),
          overlay(col("ph"), lit("XX"), lit(2), lit(3)).as("ov"),
          reverse(col("ph")).as("rev"),
          repeat(substring(col("ph"), 1, 2), 2).as("rep"),
          ascii(col("ph")).cast("long").as("asc"))
        .orderBy(col("doc_id"))
    },

    // ---- ANSI-safe try_* arithmetic ----
    // The session runs ANSI mode (Spark 4 default): divide-by-zero and
    // overflow are ERRORS unless the try_* forms absorb them to NULL —
    // the safety surface any long-running pipeline needs (one poisoned
    // row must not kill a 100 TB job). The oracle states each NULL
    // condition explicitly; mixed NULL/value rows come from the
    // first-line divisor (l_linenumber − 1 = 0 exactly on line 1) and
    // from orderkey 0, the one key where MAX+key does NOT overflow.
    Q("q192_try_arithmetic",
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_linenumber = 1 THEN NULL
        |       ELSE round(l_extendedprice / (l_linenumber - 1), 6)
        |  END AS div_prev_line,
        |  NULL AS div_zero,
        |  CASE WHEN l_orderkey = 0 THEN 9223372036854775807 END AS add_overflow,
        |  CAST(l_linenumber AS BIGINT) AS elem_at
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(expr("try_divide(l_extendedprice, CAST(l_linenumber - 1 AS DOUBLE))"), 6)
            .as("div_prev_line"),
          expr("try_divide(l_extendedprice, CAST(l_quantity - l_quantity AS DOUBLE))")
            .as("div_zero"),
          expr("try_add(9223372036854775807L, l_orderkey)").as("add_overflow"),
          expr("CAST(try_element_at(sequence(1, l_linenumber), l_linenumber) AS BIGINT)")
            .as("elem_at"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- null-preserving generators (explode_outer / LATERAL VIEW
    //      OUTER) ----
    // q54's generators DROP rows whose array is empty; the OUTER forms
    // keep them with a NULL element — the difference between "docs and
    // their matches" and "docs WITH matches" in any per-hit explode.
    // The filter keeps only 'spark' occurrences, so most docs explode
    // to nothing and the outer row is the signal.
    Q("q193_outer_generators",
      raw"""WITH d AS (SELECT doc_id,
           |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
           |                w -> w = 'spark') AS a
           |  FROM documents),
           |u AS (SELECT doc_id, unnest(a) AS w FROM d)
           |SELECT d.doc_id, CAST(len(d.a) AS BIGINT) AS n_hits, u.w
           |FROM d LEFT JOIN u USING (doc_id)
           |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(lower(trim(text)), '\\\\s+'), w -> w = 'spark')").as("a"))
        .select(col("doc_id"), size(col("a")).cast("long").as("n_hits"),
          explode_outer(col("a")).as("w"))
        .orderBy(col("doc_id"))
    },

    // ---- binary encodings battery (hex / unhex / base64 parity) ----
    // ClickHouse's hex/unhex/base64Encode/base64Decode over a binary
    // column manufactured from the row's own name (UTF-8 bytes — the
    // opaque-binary discipline the multimodal tables use). Round trips
    // prove decode∘encode = id on both engines; DuckDB renders hex
    // uppercase and Spark lowercase, so both sides pin lower(). Pure
    // codegen'd projection, fuses into the scan.
    Q("q187_binary_encodings",
      """SELECT c_custkey,
        |  lower(hex(CAST(c_name AS BLOB))) AS hx,
        |  CAST(unhex(hex(CAST(c_name AS BLOB))) AS VARCHAR) AS hx_rt,
        |  to_base64(CAST(c_name AS BLOB)) AS b64,
        |  CAST(from_base64(to_base64(CAST(c_name AS BLOB))) AS VARCHAR) AS b64_rt
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val bin = col("c_name").cast("binary")
      t(s, dir, "customer")
        .select(col("c_custkey"),
          lower(hex(bin)).as("hx"),
          unhex(hex(bin)).cast("string").as("hx_rt"),
          base64(bin).as("b64"),
          unbase64(base64(bin)).cast("string").as("b64_rt"))
        .orderBy(col("c_custkey"))
    },

    // ---- dedup-on-read with tombstones (ReplacingMergeTree FINAL
    //      parity) ----
    // ClickHouse's ReplacingMergeTree(ver, is_deleted): a SELECT … FINAL
    // keeps only the max-version row per key and drops it entirely when
    // that winner is a tombstone. The version stream is manufactured
    // from events (key = user_id, version = (ts, event_id) — total
    // order; tombstone = every 7th event). One per-key window keyed on
    // user_id (cardinality grows with data, the q169 rule) + rank-1 cut
    // + tombstone filter — the CDC "latest state wins" read every
    // landed-table consumer needs. q163's argMax picks one COLUMN's
    // winner; this keeps the winner's whole row.
    Q("q188_replacing_final",
      """WITH v AS (SELECT user_id, event_id, ts, event_type, value,
        |    CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS is_deleted,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type,
        |  CAST(round(value, 6) AS DOUBLE) AS value
        |FROM v
        |WHERE rn = 1 AND is_deleted = 0
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          col("value"),
          when(col("event_id") % 7 === 0, lit(1)).otherwise(lit(0)).as("is_deleted"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("is_deleted") === 0)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 6).cast("double").as("value"))
        .orderBy(col("user_id"))
    },

    // ---- array analytics battery (arrayCumSum / arrayDifference /
    //      arrayCompact parity) ----
    // ClickHouse's per-row array transforms, as codegen'd higher-order
    // functions over the doc's first-6-word-length array: running sum
    // (arrayCumSum), adjacent difference with a leading 0
    // (arrayDifference), consecutive-duplicate removal (arrayCompact,
    // via an aggregate() fold whose try_element_at(-1) peeks the last
    // kept value without an ANSI bounds error on the empty seed). All
    // four columns render as comma-joined strings — the driver's hasher
    // cannot sort array-typed cells (the q171 rule). The oracle states
    // the same semantics the ground-truth way: unnest + ordinal windows
    // + ordered string_agg. Pure per-row projection — fuses into the
    // scan, nothing shuffles but the final sort.
    Q("q183_array_analytics",
      raw"""WITH d AS (SELECT doc_id,
           |    list_transform((string_split_regex(lower(trim(text)), '\s+'))[1:6],
           |                   w -> length(w)) AS a
           |  FROM documents),
           |u AS (SELECT doc_id, generate_subscripts(a, 1) AS i, unnest(a) AS v FROM d),
           |w AS (SELECT doc_id, i, v,
           |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv,
           |    sum(v) OVER (PARTITION BY doc_id ORDER BY i
           |                 ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM u)
           |SELECT doc_id,
           |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS lens,
           |  string_agg(CAST(cum AS VARCHAR), ',' ORDER BY i) AS cum_sum,
           |  string_agg(CAST(v - coalesce(pv, v) AS VARCHAR), ',' ORDER BY i) AS diffs,
           |  string_agg(CASE WHEN pv IS NULL OR v != pv
           |                  THEN CAST(v AS VARCHAR) END, ',' ORDER BY i) AS compact
           |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.schema.Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          expr("transform(slice(split(lower(trim(text)), '\\\\s+'), 1, 6), w -> length(w))")
            .as("a"))
        .select(col("doc_id"),
          expr("array_join(transform(a, x -> cast(x AS STRING)), ',')").as("lens"),
          expr("""array_join(transform(sequence(1, size(a)),
                 |  i -> cast(aggregate(slice(a, 1, i), CAST(0 AS BIGINT),
                 |                      (s, x) -> s + x) AS STRING)), ',')"""
            .stripMargin).as("cum_sum"),
          expr("""array_join(transform(sequence(1, size(a)),
                 |  i -> cast(element_at(a, i) -
                 |            CASE WHEN i = 1 THEN element_at(a, i)
                 |                 ELSE element_at(a, i - 1) END AS STRING)), ',')"""
            .stripMargin).as("diffs"),
          expr("""array_join(transform(
                 |  aggregate(a, CAST(array() AS ARRAY<INT>),
                 |    (acc, x) -> CASE WHEN size(acc) > 0 AND try_element_at(acc, -1) = x
                 |                     THEN acc ELSE concat(acc, array(x)) END),
                 |  x -> cast(x AS STRING)), ',')""".stripMargin).as("compact"))
        .orderBy(col("doc_id"))
    },

    // ---- character n-gram string distance (ngramDistance parity) ----
    // ClickHouse's ngramDistance(a, b): 1 − |grams(a) ∩ grams(b)| /
    // |grams(a) ∪ grams(b)| over character trigram SETS. Here between
    // each document's opening and closing 5-word phrases — a pure
    // per-row projection (gram enumeration via transform over a
    // sequence, set ops via array_distinct/intersect/union), fuses into
    // the scan. Sizes are exact integers; the distance is one IEEE
    // division, so no rounding is needed (the q199 rule).
    Q("q201_ngram_distance",
      raw"""WITH p AS (SELECT doc_id,
           |    array_to_string((string_split_regex(lower(trim(text)), '\s+'))[1:5], ' ')
           |      AS ha,
           |    array_to_string(list_reverse(list_reverse(
           |      string_split_regex(lower(trim(text)), '\s+'))[1:5]), ' ') AS hb
           |  FROM documents),
           |g AS (SELECT doc_id,
           |    list_distinct([ha[i:i+2] FOR i IN range(1, greatest(len(ha) - 1, 1))])
           |      AS ga,
           |    list_distinct([hb[i:i+2] FOR i IN range(1, greatest(len(hb) - 1, 1))])
           |      AS gb
           |  FROM p),
           |m AS (SELECT doc_id,
           |    CAST(len(ga) AS BIGINT) AS n_a, CAST(len(gb) AS BIGINT) AS n_b,
           |    CAST(len(list_filter(ga, x -> list_contains(gb, x))) AS BIGINT)
           |      AS inter
           |  FROM g)
           |SELECT doc_id, n_a, n_b, inter,
           |  n_a + n_b - inter AS uni,
           |  CASE WHEN n_a + n_b - inter = 0 THEN CAST(0.0 AS DOUBLE)
           |       ELSE 1 - CAST(inter AS DOUBLE)
           |              / CAST(n_a + n_b - inter AS DOUBLE) END AS dist
           |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Phrases shorter than 3 chars have NO trigram (matching the
      // oracle's empty range) — without the guard, sequence(1,
      // greatest(len-2,1)) would emit one truncated gram the oracle
      // doesn't, and uni = 0 would make dist 0/0 (ADVICE r9).
      def grams(c: String) = expr(
        s"""CASE WHEN length($c) >= 3 THEN array_distinct(transform(
           |    sequence(1, length($c) - 2),
           |    i -> substring($c, i, 3)))
           |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)
      graft.schema.Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"), 1, 5)).as("ha"),
          concat_ws(" ", reverse(slice(reverse(split(lower(trim(col("text"))), "\\s+")), 1, 5)))
            .as("hb"))
        .select(col("doc_id"), grams("ha").as("ga"), grams("hb").as("gb"))
        .select(col("doc_id"),
          size(col("ga")).cast("long").as("n_a"),
          size(col("gb")).cast("long").as("n_b"),
          size(array_intersect(col("ga"), col("gb"))).cast("long").as("inter"))
        .select(col("doc_id"), col("n_a"), col("n_b"), col("inter"),
          (col("n_a") + col("n_b") - col("inter")).as("uni"))
        .withColumn("dist",
          when(col("uni") === 0, lit(0.0))
            .otherwise(lit(1) - col("inter").cast("double")
              / col("uni").cast("double")))
        .orderBy(col("doc_id"))
    },

    // ---- per-key map extremes + bounded distinct collect (minMap /
    //      maxMap / groupUniqArray(N) parity) ----
    // q171 covers sumMap (per-key additive merge); these are the lattice
    // forms — per event type the min and max value seen by each user —
    // plus the bounded distinct collect (first 3 types in sorted order,
    // so the "any N" contract is deterministic). Values render through
    // DECIMAL(12,2) so both engines print identical scale. One hash
    // aggregate per level, map-side combinable.
    Q("q209_map_extremes",
      """WITH c AS (SELECT user_id, event_type,
        |    CAST(min(value) AS DECIMAL(12,2)) AS mn,
        |    CAST(max(value) AS DECIMAL(12,2)) AS mx
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  string_agg(event_type || ':' || mn, ',' ORDER BY event_type)
        |    AS min_map,
        |  string_agg(event_type || ':' || mx, ',' ORDER BY event_type)
        |    AS max_map,
        |  array_to_string(list_sort(list(DISTINCT event_type))[1:3], ',')
        |    AS first3_types
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      graft.schema.Tables.t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("value")).cast("decimal(12,2)").as("mn"),
          max(col("value")).cast("decimal(12,2)").as("mx"))
        .groupBy(col("user_id"))
        .agg(
          expr("""array_join(transform(array_sort(
                 |  collect_list(struct(event_type, mn))),
                 |  e -> concat(e.event_type, ':', CAST(e.mn AS STRING))), ',')"""
            .stripMargin).as("min_map"),
          expr("""array_join(transform(array_sort(
                 |  collect_list(struct(event_type, mx))),
                 |  e -> concat(e.event_type, ':', CAST(e.mx AS STRING))), ',')"""
            .stripMargin).as("max_map"),
          expr("array_join(slice(array_sort(collect_set(event_type)), 1, 3), ',')")
            .as("first3_types"))
        .orderBy(col("user_id"))
    },

    // ---- next node after a matched anchor (sequenceNextNode parity) ----
    // ClickHouse's sequenceNextNode(forward, head)(ts, event_type, cond):
    // the event that FOLLOWS the first matching anchor in each user's
    // stream. Anchor = the user's first 'click' (total order ts,
    // event_id); the answer is the next event's type and timestamp —
    // NULL when the anchor is the user's last event. One per-user window
    // pass (lead + row_number on the same ordering collapses into a
    // single Window operator), user_id cardinality grows with the data.
    Q("q202_sequence_next_node",
      """WITH o AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS us,
        |    lead(event_type) OVER w AS next_type,
        |    lead(epoch_us(ts)) OVER w AS next_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |a AS (SELECT user_id, event_id, us, next_type, next_us,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS rn
        |  FROM o WHERE event_type = 'click')
        |SELECT user_id, CAST(us AS BIGINT) AS anchor_us, next_type,
        |  CAST(next_us AS BIGINT) AS next_us
        |FROM a WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val o = graft.schema.Tables.t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .select(col("user_id"), col("event_type"), col("event_id"), col("us"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          lead(col("us"), 1).over(w).as("next_us"))
      o.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("us").cast("long").as("anchor_us"),
          col("next_type"), col("next_us").cast("long").as("next_us"))
        .orderBy(col("user_id"))
    },

    // ---- relative-rank windows (percent_rank / cume_dist) ----
    // Completes q21's rank battery with the two RELATIVE rank forms —
    // per market segment so the windows key on a real partition column.
    // Both are ratios of exact integers ((rank−1)/(n−1), peers/n): the
    // single IEEE division is bit-identical across engines, so no
    // rounding (the q199 rule). Singleton partitions make percent_rank
    // 0/0 → both engines define it as 0.
    Q("q221_relative_rank",
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(ntile(10) OVER w AS INTEGER) AS decile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(10).over(w).cast("int").as("decile"))
        .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
    },

    // ---- groupArrayMovingSum / groupArrayMovingAvg parity ----
    // Per user, the ordered array of trailing-3 moving sums and means of
    // `value`. The moving sum is an EXPLICIT lag chain
    // (v + lag(v,1,0)) + lag(v,2,0) — not a windowed sum() — because a
    // framed sum() lets each engine pick its own summation tree (DuckDB
    // uses a segment tree) and double addition is not associative; the
    // lag chain pins one association order in both engines. Arrays are
    // emitted as comma-joined micro-unit integers (round(ms·1e6) — all
    // values ≥ 0 so HALF_UP and away-from-zero agree), the repo's
    // array-render discipline. The per-user window is scale-legal:
    // user_id cardinality grows with the data (the q169 argument).
    Q("q226_moving_window_arrays",
      raw"""WITH w AS (SELECT user_id, ts, event_id, value,
           |    (value + coalesce(lag(value, 1) OVER
           |       (PARTITION BY user_id ORDER BY ts, event_id), 0))
           |     + coalesce(lag(value, 2) OVER
           |       (PARTITION BY user_id ORDER BY ts, event_id), 0) AS ms,
           |    least(CAST(row_number() OVER
           |       (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT),
           |       3) AS k
           |  FROM events)
           |SELECT user_id,
           |  string_agg(CAST(CAST(round(ms * 1000000.0, 0) AS BIGINT)
           |             AS VARCHAR), ',' ORDER BY ts, event_id) AS moving_sum_u,
           |  string_agg(CAST(CAST(round(ms / k * 1000000.0, 0) AS BIGINT)
           |             AS VARCHAR), ',' ORDER BY ts, event_id) AS moving_avg_u
           |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ms = (col("value") + coalesce(lag(col("value"), 1).over(w), lit(0))) +
        coalesce(lag(col("value"), 2).over(w), lit(0))
      val k = least(row_number().over(w).cast("long"), lit(3L))
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          ms.as("ms"), k.as("k"))
        .groupBy(col("user_id"))
        .agg(
          concat_ws(",", sort_array(collect_list(struct(
            col("ts"), col("event_id"),
            round(col("ms") * lit(1000000.0), 0).cast("long").cast("string")
              .as("r")))).getField("r")).as("moving_sum_u"),
          concat_ws(",", sort_array(collect_list(struct(
            col("ts"), col("event_id"),
            round(col("ms") / col("k") * lit(1000000.0), 0).cast("long").cast("string")
              .as("r")))).getField("r")).as("moving_avg_u"))
        .orderBy(col("user_id"))
    },

    // ---- arrayEnumerateUniq / arrayEnumerateDense parity ----
    // Over each doc's first 12 tokens: per position, the occurrence
    // index of that value so far (Uniq) and the value's first-appearance
    // dense id (Dense) — pure nested HOFs over a 12-element array, O(n²)
    // with n=12, entirely inside whole-stage codegen; no shuffle but the
    // final report sort.
    Q("q229_array_enumerate",
      raw"""WITH d AS (SELECT doc_id,
           |    (string_split_regex(lower(trim(text)), '\s+'))[1:12] AS a
           |  FROM documents),
           |e AS (SELECT doc_id,
           |    list_transform(range(1, len(a) + 1),
           |      i -> len(list_filter(a[1:i], x -> x = a[i]))) AS uq,
           |    list_transform(range(1, len(a) + 1),
           |      i -> len(list_distinct(a[1:list_position(a, a[i])]))) AS de
           |  FROM d)
           |SELECT doc_id,
           |  array_to_string(uq, ',') AS enum_uniq,
           |  array_to_string(de, ',') AS enum_dense
           |FROM e ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr(raw"slice(split(lower(trim(text)), '\\s+'), 1, 12)").as("a"))
        .select(col("doc_id"),
          expr("""array_join(transform(sequence(1, size(a)),
                 |  i -> cast(size(filter(slice(a, 1, i),
                 |         x -> x = element_at(a, i))) AS STRING)), ',')"""
            .stripMargin).as("enum_uniq"),
          expr("""array_join(transform(sequence(1, size(a)),
                 |  i -> cast(size(array_distinct(
                 |         slice(a, 1, cast(array_position(a, element_at(a, i)) AS INT))))
                 |       AS STRING)), ',')""".stripMargin).as("enum_dense"))
        .orderBy(col("doc_id"))
    },

    // ---- sparkbar parity ----
    // Per event_type, the 24-char hour-of-day activity bar — ClickHouse's
    // sparkbar(24) rendered from exact hourly counts. The glyph level is
    // ceil(cnt · 8 / max): cnt·8.0 is integer-exact in a double below
    // 2^50 and an exact division can't straddle a ceil boundary, so the
    // glyph index is deterministic in both engines. One tiny two-level
    // aggregate (|types|·24 rows), then a per-type string fold.
    Q("q230_sparkbar",
      raw"""WITH h AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
           |    count(*) AS cnt
           |  FROM events GROUP BY event_type, hr),
           |m AS (SELECT event_type, max(cnt) AS mx FROM h GROUP BY event_type)
           |SELECT h.event_type,
           |  string_agg(substr('▁▂▃▄▅▆▇█',
           |    CAST(ceil(cnt * 8.0 / mx) AS BIGINT), 1), '' ORDER BY hr)
           |    AS bar,
           |  CAST(sum(cnt) AS BIGINT) AS n
           |FROM h JOIN m USING (event_type)
           |GROUP BY h.event_type ORDER BY h.event_type""".stripMargin) { (s, dir) =>
      val h = t(s, dir, "events")
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val m = h.groupBy(col("event_type")).agg(max(col("cnt")).as("mx"))
      h.join(broadcast(m), Seq("event_type"))
        .select(col("event_type"), col("hr"), col("cnt"),
          lit("▁▂▃▄▅▆▇█")
            .substr(ceil(col("cnt") * lit(8.0) / col("mx")).cast("int"), lit(1))
            .as("g"))
        .groupBy(col("event_type"))
        .agg(
          concat_ws("", sort_array(collect_list(struct(col("hr"), col("g"))))
            .getField("g")).as("bar"),
          sum(col("cnt")).as("n"))
        .orderBy(col("event_type"))
    }
  )
}
