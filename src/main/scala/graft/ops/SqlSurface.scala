package graft.ops

import graft.Q
import graft.schema.Tables

/** SQL-surface features landed in Spark 4.x that round out the query
  * language: ordered-set string aggregation (`listagg WITHIN GROUP`),
  * correlated `LATERAL` subqueries (per-row top-k without a window over
  * the whole fact table), and recursive CTEs (the gap-filling calendar
  * spine every reporting pipeline needs). All three run through
  * `spark.sql` on the shared temp views — this family exists precisely to
  * prove the SQL text surface, not the DataFrame wrappers.
  */
object SqlSurface {

  /** q96's SQL is dialect-identical, so ONE definition serves as both the
    * Spark text and the DuckDB oracle — the same no-drift discipline as
    * TextCommon (q95/q97 genuinely differ per dialect: listagg vs
    * string_agg, date_format vs strftime). */
  /** q164's SQL is dialect-identical too — one definition, both engines
    * (the LateralSql discipline). */
  private val FilteredAggSql =
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_value,
      |  CAST(count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000)
      |    AS BIGINT) AS big_spenders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  private val LateralSql =
    """SELECT n.n_name AS nation, l.c_name AS c_name, l.c_acctbal AS acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) AS l
      |ORDER BY nation, acctbal DESC, c_name""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- ordered-set string aggregation ----
    // listagg is new in Spark 4.0; WITHIN GROUP pins the concatenation
    // order so the result is deterministic. DuckDB spells the same thing
    // string_agg(expr, sep ORDER BY key). Scale: |groups| output rows and
    // partial aggregation like any agg — but the buffer is the
    // concatenated string, so at 100 TB you bound group fan-in first
    // (here: 5 nations per region by construction).
    Q("q95_string_agg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql(
        """SELECT r_name, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
          |FROM region JOIN nation ON r_regionkey = n_regionkey
          |GROUP BY r_name
          |ORDER BY r_name""".stripMargin)
    },

    // ---- correlated LATERAL subquery: per-nation top-k ----
    // The "top 2 customers per nation" shape without windowing the whole
    // customer table: the lateral subquery is correlated on n_nationkey,
    // and Catalyst decorrelates it into a ranked join — same plan family
    // as q18's window top-k but expressed as the SQL standard's LATERAL.
    // Deterministic tiebreak on (acctbal DESC, name).
    Q("q96_lateral_topk", LateralSql) { (s, dir) =>
      Tables.views(s, dir)
      s.sql(LateralSql)
    },

    // ---- recursive CTE: gap-free monthly spine ----
    // WITH RECURSIVE is new in Spark 4.x. The spine generates every month
    // of 1995 whether or not orders landed in it, then LEFT JOINs the
    // per-month order counts — the gap-filling pattern a plain GROUP BY
    // cannot produce (months with zero orders simply don't exist in the
    // data). Two deliberate scale choices: (1) literal bounds — each
    // recursion step is one Spark job, so a data-driven endpoint would
    // re-scan orders every round (measured ~0.3 s/round of pure fixed
    // cost); a reporting window is a parameter, not something to
    // rediscover per round. (2) orders are aggregated to |months| rows
    // BEFORE the spine join — joining the raw fact table on a 12-value
    // month key would put all 100 TB through a 12-key shuffle (maximal
    // skew); the narrow agg shuffles |months| rows instead and the year
    // filter is pushed to the parquet scan.
    Q("q97_recursive_spine",
      """WITH RECURSIVE m(d) AS (
        |  SELECT TIMESTAMP '1995-01-01 00:00:00'
        |  UNION ALL
        |  SELECT d + INTERVAL 1 MONTH FROM m
        |  WHERE d < TIMESTAMP '1995-12-01 00:00:00'),
        |c AS (SELECT date_trunc('month', o_orderdate) AS od, count(*) AS n
        |      FROM orders
        |      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
        |      GROUP BY 1)
        |SELECT strftime(m.d, '%Y-%m') AS month,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
        |FROM m LEFT JOIN c ON c.od = m.d
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql(
        """WITH RECURSIVE m(d) AS (
          |  SELECT TIMESTAMP '1995-01-01 00:00:00'
          |  UNION ALL
          |  SELECT d + INTERVAL 1 MONTH FROM m
          |  WHERE d < TIMESTAMP '1995-12-01 00:00:00'),
          |c AS (SELECT date_trunc('month', o_orderdate) AS od, count(*) AS n
          |      FROM orders
          |      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
          |      GROUP BY 1)
          |SELECT date_format(m.d, 'yyyy-MM') AS month, coalesce(c.n, 0L) AS n_orders
          |FROM m LEFT JOIN c ON c.od = m.d
          |ORDER BY 1""".stripMargin)
    },

    // ---- TABLESAMPLE: engine-side Bernoulli page/row sampling ----
    // The SQL-standard sampling clause — REPEATABLE pins the seed so a
    // re-run of the same plan samples the same rows, but the row set still
    // depends on the engine's partitioning (seed + partition index), so no
    // cross-engine oracle can hash-match: rows-only, like q57's
    // DataFrame-side sample. Aggregated to |status| rows so the output
    // shape is stable whatever the sample draws. Scale: sampling is
    // evaluated inside the scan — each task keeps ~50% of its rows with
    // zero shuffle, and the aggregate above it is a narrow 3-row agg.
    Q.rowsOnly("q98_tablesample") { (s, dir) =>
      Tables.views(s, dir)
      s.sql(
        """SELECT o_orderstatus, count(*) AS n_sampled
          |FROM orders TABLESAMPLE (50 PERCENT) REPEATABLE (42)
          |GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    },

    // ---- GROUP BY ALL: group on every non-aggregate select column ----
    // The modern-SQL convenience both engines support natively; the plan
    // is a plain two-phase hash aggregate on the inferred keys, so the
    // surface sugar costs nothing at scale. DECIMAL sum cast to DOUBLE on
    // both sides per the parity rules; dialect-identical SQL serves both.
    Q("q102_group_by_all",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(o_totalprice) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(count(*) AS BIGINT) AS n_orders,
          |  CAST(sum(o_totalprice) AS DOUBLE) AS total_price
          |FROM orders
          |GROUP BY ALL
          |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
    },

    // ---- ORDER BY ... LIMIT k OFFSET n: paginated top-k ----
    // The pagination idiom. Spark folds LIMIT+OFFSET into one
    // TakeOrderedAndProject (top-(k+n) per partition, drop n after the
    // final merge) — never a global sort, so page depth costs k+n memory
    // on one task, not a corpus sort. Dialect-identical SQL serves both
    // engines; DECIMAL cast to DOUBLE on both sides per the parity rules.
    Q("q99_limit_offset",
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
        |FROM orders
        |ORDER BY totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin) { (s, dir) =>
      Tables.views(s, dir)
      s.sql(
        """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
          |FROM orders
          |ORDER BY totalprice DESC, o_orderkey
          |LIMIT 10 OFFSET 20""".stripMargin)
    },

    // ---- FILTER (WHERE …) aggregate modifier ----
    // The SQL-standard per-aggregate predicate — one pass computing
    // differently-filtered aggregates side by side, where pre-FILTER SQL
    // needed CASE-WHEN inside every aggregate. Dialect-identical text
    // serves both engines (DECIMAL sums exact on both, CAST per parity
    // rules). Plan shape is the ordinary two-phase hash aggregate: the
    // filters are per-row predicates inside the partial agg, adding zero
    // shuffles.
    Q("q164_filtered_agg", FilteredAggSql) { (s, dir) =>
      Tables.views(s, dir)
      s.sql(FilteredAggSql)
    }
  )
}
