package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Round-9 statistical / geo / network scalar-and-aggregate parity — the
  * ClickHouse destination-engine functions a reference user could call on
  * landed tables that were not yet covered by q12/q24–q28/q77:
  * skewPop/kurtPop/corr/covarPop (q172), simpleLinearRegression (q173),
  * groupBitAnd/Or/Xor + groupBoolAnd/Or (q174), URL functions (q175),
  * IPv4NumToString/StringToNum (q176), greatCircleDistance (q177),
  * runningDifference/deltaSum (q178). Cf. the reference's ClickHouse DDL
  * surface (/root/reference/internal/collector/collector.go) — the engine
  * its tables land in exposes all of these.
  *
  * Every aggregate here is a single map-side-combinable hash aggregate or
  * a high-cardinality-keyed window — no single-partition shapes; scalar
  * batteries are pure per-row codegen'd projections that fuse into one
  * WholeStageCodegen span over the scan.
  */
object StatsGeo {

  /** q249's polygon: a fixed convex-ish pentagon in (lon, lat), and the
    * unrolled ray-cast predicate generated ONCE for both engines — five
    * edge-crossing terms summed, inside = odd parity. */
  private val Poly: Seq[(Double, Double)] =
    Seq((-60.0, -30.0), (40.0, -50.0), (70.0, 0.0), (10.0, 55.0), (-50.0, 40.0))

  private lazy val InsidePolySql: String = {
    val terms = Poly.zip(Poly.tail :+ Poly.head).map { case ((x1, y1), (x2, y2)) =>
      s"""(CASE WHEN (($y1 > lat) <> ($y2 > lat))
         | AND (lon < ($x2 - $x1) * (lat - $y1) / ($y2 - $y1) + $x1)
         | THEN 1 ELSE 0 END)""".stripMargin.replace("\n", "")
    }
    s"(${terms.mkString(" + ")}) % 2 = 1"
  }

  def qs: Seq[Q] = Seq(

    // ---- higher central moments + covariance (skewPop/kurtPop/corr/covarPop) ----
    // Spark's skewness/kurtosis are the POPULATION forms (g1 = m3/m2^1.5,
    // excess g2 = m4/m2^2 − 3); DuckDB's builtins are the SAMPLE forms, so
    // the oracle states the population definition explicitly from raw
    // central moments (two-pass over the per-group mean — exact, order-
    // insensitive after the round(6)). skew/kurt/corr are scale-free O(1)
    // values and covar_pop is shared-definition in both engines; round(4)
    // on the scaled covariance absorbs summation-order ulps.
    Q("q172_stats_moments",
      """WITH mu AS (SELECT c_mktsegment, avg(c_acctbal) AS m
        |  FROM customer GROUP BY c_mktsegment),
        |mom AS (SELECT c.c_mktsegment,
        |    count(*) AS n,
        |    avg(pow(c_acctbal - m, 2)) AS m2,
        |    avg(pow(c_acctbal - m, 3)) AS m3,
        |    avg(pow(c_acctbal - m, 4)) AS m4,
        |    corr(c_acctbal, CAST(c_nationkey AS DOUBLE)) AS r,
        |    covar_pop(c_acctbal, CAST(c_nationkey AS DOUBLE)) AS cv
        |  FROM customer c JOIN mu USING (c_mktsegment)
        |  GROUP BY c.c_mktsegment)
        |SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
        |  round(m3 / pow(m2, 1.5), 6) AS skew_pop,
        |  round(m4 / (m2 * m2) - 3, 6) AS kurt_pop,
        |  round(r, 6) AS corr_bal_nation,
        |  round(cv, 4) AS covar_pop_bal_nation
        |FROM mom
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(skewness(col("c_acctbal")), 6).as("skew_pop"),
          round(kurtosis(col("c_acctbal")), 6).as("kurt_pop"),
          round(corr(col("c_acctbal"), col("c_nationkey").cast("double")), 6)
            .as("corr_bal_nation"),
          round(covar_pop(col("c_acctbal"), col("c_nationkey").cast("double")), 4)
            .as("covar_pop_bal_nation"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- ordinary least squares (simpleLinearRegression parity) ----
    // y = l_extendedprice on x = l_quantity per return flag. regr_* share
    // one definition across engines (slope = covar/var, r2 = corr²); both
    // are ratios of big sums, so the quotient is ulp-stable and round(4)
    // is conservative. One hash aggregate, map-side partials — the shape
    // survives any scale.
    Q("q173_linreg",
      """SELECT l_returnflag,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)").as("n"),
          expr("round(regr_slope(l_extendedprice, l_quantity), 4)").as("slope"),
          expr("round(regr_intercept(l_extendedprice, l_quantity), 4)").as("intercept"),
          expr("round(regr_r2(l_extendedprice, l_quantity), 6)").as("r2"))
        .orderBy(col("l_returnflag"))
    },

    // ---- bitwise + boolean aggregates (groupBitAnd/Or/Xor, groupBoolAnd/Or) ----
    // Exact integer/boolean lattice aggregates — commutative, associative,
    // perfectly mergeable partials (the cheapest possible 100 TB shape).
    Q("q174_bit_aggregates",
      """SELECT o_orderstatus,
        |  CAST(bit_and(o_orderkey) AS BIGINT) AS band,
        |  CAST(bit_or(o_orderkey) AS BIGINT) AS bor,
        |  CAST(bit_xor(o_orderkey) AS BIGINT) AS bxor,
        |  bool_and(o_totalprice > 1000.0) AS all_big,
        |  bool_or(o_totalprice > 100000.0) AS any_huge
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("CAST(bit_and(o_orderkey) AS BIGINT)").as("band"),
          expr("CAST(bit_or(o_orderkey) AS BIGINT)").as("bor"),
          expr("CAST(bit_xor(o_orderkey) AS BIGINT)").as("bxor"),
          expr("bool_and(o_totalprice > 1000.0D)").as("all_big"),
          expr("bool_or(o_totalprice > 100000.0D)").as("any_huge"))
        .orderBy(col("o_orderstatus"))
    },

    // ---- URL decomposition (domain/topLevelDomain/path/param/fragment) ----
    // A deterministic URL is manufactured per document, then decomposed
    // with Spark's codegen'd parse_url. The oracle states the expected
    // parts from the SAME source columns directly — ground truth, not a
    // second parser — so any parse_url deviation (scheme handling, query
    // splitting, fragment cut) fails loudly.
    Q("q175_url_funcs",
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  'com' AS tld,
        |  '/' || lang || '/doc-' || doc_id AS path,
        |  'lang=' || lang || '&src=' || source AS query,
        |  source AS src_param,
        |  'f' || doc_id AS fragment
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val url = concat(lit("https://"), col("source"), lit(".example.com/"),
        col("lang"), lit("/doc-"), col("doc_id"),
        lit("?lang="), col("lang"), lit("&src="), col("source"),
        lit("#f"), col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), url.as("u"))
        .select(col("doc_id"),
          expr("parse_url(u, 'HOST')").as("host"),
          element_at(split(expr("parse_url(u, 'HOST')"), "\\."), -1).as("tld"),
          expr("parse_url(u, 'PATH')").as("path"),
          expr("parse_url(u, 'QUERY')").as("query"),
          expr("parse_url(u, 'QUERY', 'src')").as("src_param"),
          expr("parse_url(u, 'REF')").as("fragment"))
        .orderBy(col("doc_id"))
    },

    // ---- IPv4 num↔string roundtrip (IPv4NumToString/IPv4StringToNum) ----
    // A synthetic /32 per customer (Knuth-hash of the key into 2^32),
    // rendered dotted-quad by octet arithmetic and parsed back — both
    // directions exact integer math, one codegen'd projection. The oracle
    // repeats the octet arithmetic in DuckDB (`//` ≡ Spark `div`).
    Q("q176_ip_funcs",
      """WITH i AS (SELECT c_custkey, (c_custkey * 2654435761) % 4294967296 AS ip
        |  FROM customer)
        |SELECT c_custkey, CAST(ip AS BIGINT) AS ip,
        |  CAST(ip // 16777216 AS VARCHAR) || '.' ||
        |  CAST(ip // 65536 % 256 AS VARCHAR) || '.' ||
        |  CAST(ip // 256 % 256 AS VARCHAR) || '.' ||
        |  CAST(ip % 256 AS VARCHAR) AS dotted,
        |  CAST(ip AS BIGINT) AS ip_rt
        |FROM i
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val ip = (col("c_custkey") * lit(2654435761L)) % lit(4294967296L)
      val oct = Seq(16777216L, 65536L, 256L, 1L).map(d =>
        ((col("ip").divide(lit(d)).cast("long")) % lit(256L)).cast("string"))
      t(s, dir, "customer")
        .select(col("c_custkey"), ip.cast("long").as("ip"))
        .select(col("c_custkey"), col("ip"),
          concat_ws(".", oct: _*).as("dotted"))
        .select(col("c_custkey"), col("ip"), col("dotted"),
          aggregate(split(col("dotted"), "\\."), lit(0L),
            (acc, o) => acc * lit(256L) + o.cast("long")).as("ip_rt"))
        .orderBy(col("c_custkey"))
    },

    // ---- great-circle distance (greatCircleDistance parity) ----
    // Synthetic lat/lon per customer; haversine metres to a fixed point
    // (ClickHouse returns metres). The formula is stated identically on
    // both engines over identical double inputs — a handful of
    // transcendental ops whose fp error is ~1 ulp, so round to whole
    // metres. Pure per-row projection, fuses into the scan.
    Q("q177_great_circle",
      """WITH g AS (SELECT c_custkey,
        |    (c_custkey * 7919) % 18000 / 100.0 - 90.0 AS lat,
        |    (c_custkey * 104729) % 36000 / 100.0 - 180.0 AS lon
        |  FROM customer)
        |SELECT c_custkey, round(lat, 2) AS lat, round(lon, 2) AS lon,
        |  round(2 * 6371000 * asin(sqrt(
        |    pow(sin(radians(lat - 48.8566) / 2), 2) +
        |    cos(radians(lat)) * cos(radians(48.8566)) *
        |    pow(sin(radians(lon - 2.3522) / 2), 2))), 0) AS metres
        |FROM g
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val lat = (col("c_custkey") * lit(7919L)) % lit(18000L) / lit(100.0) - lit(90.0)
      val lon = (col("c_custkey") * lit(104729L)) % lit(36000L) / lit(100.0) - lit(180.0)
      val hav = lit(2.0) * lit(6371000.0) * asin(sqrt(
        pow(sin(radians(col("lat") - lit(48.8566)) / 2), 2) +
          cos(radians(col("lat"))) * cos(radians(lit(48.8566))) *
            pow(sin(radians(col("lon") - lit(2.3522)) / 2), 2)))
      t(s, dir, "customer")
        .select(col("c_custkey"), lat.as("lat"), lon.as("lon"))
        .select(col("c_custkey"), round(col("lat"), 2).as("lat"),
          round(col("lon"), 2).as("lon"), round(hav, 0).as("metres"))
        .orderBy(col("c_custkey"))
    },

    // ---- point-in-polygon containment (pointInPolygon parity) ----
    // Ray casting against a fixed 5-vertex polygon, fully unrolled: the
    // five edge-crossing tests AND the parity fold are ONE generated SQL
    // expression — built by the same Scala loop for both engines (the
    // q204 oracle-generation idiom), evaluated by Spark via expr() so
    // the expression trees are textually identical. Pure comparisons and
    // rational arithmetic on synthetic (q177) coordinates — no
    // transcendentals, bit-identical, no rounding on the predicate. The
    // whole classify step is a per-row codegen'd projection fused into
    // the scan (zero shuffle); only the |nations|-key count aggregate
    // exchanges. At 100 TB a polygon table would broadcast and the same
    // expression runs per (point, polygon) candidate.
    Q("q249_point_in_polygon",
      s"""WITH g AS (SELECT c_custkey, c_nationkey,
         |    (c_custkey * 7919) % 18000 / 100.0 - 90.0 AS lat,
         |    (c_custkey * 104729) % 36000 / 100.0 - 180.0 AS lon
         |  FROM customer),
         |f AS (SELECT c_nationkey, ($InsidePolySql) AS inside FROM g)
         |SELECT c_nationkey,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
         |  round(CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS inside_share
         |FROM f
         |GROUP BY c_nationkey
         |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val lat = (col("c_custkey") * lit(7919L)) % lit(18000L) / lit(100.0) - lit(90.0)
      val lon = (col("c_custkey") * lit(104729L)) % lit(36000L) / lit(100.0) - lit(180.0)
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          lat.as("lat"), lon.as("lon"))
        .withColumn("inside", expr(InsidePolySql))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).cast("long").as("n_customers"),
          sum(when(col("inside"), 1).otherwise(0)).cast("long").as("n_inside"),
          round(sum(when(col("inside"), 1).otherwise(0)).cast("double")
            / count(lit(1)), 6).as("inside_share"))
        .orderBy(col("c_nationkey"))
    },

    // ---- runningDifference + deltaSum per user stream ----
    // ClickHouse's runningDifference(value) is lag-subtract in stream
    // order; deltaSum(value) accumulates only the POSITIVE deltas. Window
    // keys on user_id (cardinality grows with the data — the q169 rule),
    // ties broken by event_id; per-row deltas round(6), and the per-user
    // reduction sums DECIMAL(18,6)-quantized deltas so the total is
    // order-independent (the q101 folded-sum rule, decimal form).
    Q("q178_delta_sum",
      """WITH d AS (SELECT user_id, event_id,
        |    CAST(round(value - lag(value) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id), 6)
        |      AS DECIMAL(18,6)) AS diff
        |  FROM events)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(diff) AS BIGINT) AS n_diffs,
        |  CAST(coalesce(sum(CASE WHEN diff > 0 THEN diff END), 0) AS DOUBLE)
        |    AS delta_sum
        |FROM d
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(col("value") - lag(col("value"), 1).over(w), 6)
            .cast("decimal(18,6)").as("diff"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          count(col("diff")).cast("long").as("n_diffs"),
          coalesce(sum(when(col("diff") > 0, col("diff"))), lit(0))
            .cast("double").as("delta_sum"))
        .orderBy(col("user_id"))
    },

    // ---- geohash encode + decode roundtrip (geohashEncode parity) ----
    // Standard geohash at precision 6: 15 lon bits and 15 lat bits
    // interleaved lon-first into a 30-bit cell id, base32-coded with the
    // canonical "0123456789bcdefghjkmnpqrstuvwxyz" alphabet. The
    // interleave/char-split/decode expressions are GENERATED by one Scala
    // loop for both engines (the q204 generated-oracle idiom) — Spark gets
    // shiftright/&-based bit extraction, DuckDB the same arithmetic with
    // its operators — so the bit layout cannot drift between sides.
    // Decode is exercised for real: the hash string is re-parsed through
    // the alphabet (instr/strpos) back to the cell id and compared.
    // Scale: a pure per-row codegen'd projection over the scan — one
    // WholeStageCodegen span, no shuffle at all.
    Q("q262_geohash", {
      val duckG = (0 until 15).map { j =>
        s"((lon_n // ${1L << (14 - j)}) % 2) * ${1L << (29 - 2 * j)}" +
          s" + ((lat_n // ${1L << (14 - j)}) % 2) * ${1L << (28 - 2 * j)}"
      }.mkString(" + ")
      val duckHash = (0 until 6).map { c =>
        s"substr('$GeoAlpha', CAST((g // ${1L << (25 - 5 * c)}) % 32 AS INT) + 1, 1)"
      }.mkString(" || ")
      val duckG2 = (0 until 6).map { c =>
        s"(strpos('$GeoAlpha', substr(geohash, ${c + 1}, 1)) - 1) * ${1L << (25 - 5 * c)}"
      }.mkString(" + ")
      s"""WITH pts AS (SELECT c_custkey,
        |    (c_custkey * 7919) % 18000 / 100.0 - 90.0 AS lat,
        |    (c_custkey * 104729) % 36000 / 100.0 - 180.0 AS lon
        |  FROM customer),
        |q AS (SELECT c_custkey, lat, lon,
        |    CAST(floor((lat + 90.0) / 180.0 * 32768.0) AS BIGINT) AS lat_n,
        |    CAST(floor((lon + 180.0) / 360.0 * 32768.0) AS BIGINT) AS lon_n
        |  FROM pts),
        |gg AS (SELECT c_custkey, lat_n, lon_n, $duckG AS g FROM q),
        |hh AS (SELECT c_custkey, lat_n, lon_n, g, $duckHash AS geohash FROM gg)
        |SELECT c_custkey, geohash,
        |  round((CAST(lat_n AS DOUBLE) + 0.5) / 32768.0 * 180.0 - 90.0, 6) AS lat_c,
        |  round((CAST(lon_n AS DOUBLE) + 0.5) / 32768.0 * 360.0 - 180.0, 6) AS lon_c,
        |  ($duckG2) = g AS roundtrip
        |FROM hh
        |ORDER BY c_custkey""".stripMargin
    }) { (s, dir) =>
      val lat = (col("c_custkey") * lit(7919L)) % lit(18000L) / lit(100.0) - lit(90.0)
      val lon = (col("c_custkey") * lit(104729L)) % lit(36000L) / lit(100.0) - lit(180.0)
      val q = t(s, dir, "customer").select(col("c_custkey"),
        floor((lat + 90.0) / 180.0 * 32768.0).cast("long").as("lat_n"),
        floor((lon + 180.0) / 360.0 * 32768.0).cast("long").as("lon_n"))
      val g = (0 until 15).map { j =>
        (shiftright(col("lon_n"), 14 - j) % 2) * lit(1L << (29 - 2 * j)) +
          (shiftright(col("lat_n"), 14 - j) % 2) * lit(1L << (28 - 2 * j))
      }.reduce(_ + _)
      val gg = q.select(col("c_custkey"), col("lat_n"), col("lon_n"), g.as("g"))
      val hash = concat((0 until 6).map { c =>
        expr(s"substr('$GeoAlpha', CAST(shiftright(g, ${25 - 5 * c}) % 32 AS INT) + 1, 1)")
      }: _*)
      val hh = gg.select(col("c_custkey"), col("lat_n"), col("lon_n"), col("g"),
        hash.as("geohash"))
      val g2 = (0 until 6).map { c =>
        (expr(s"instr('$GeoAlpha', substr(geohash, ${c + 1}, 1))") - 1) *
          lit(1L << (25 - 5 * c))
      }.reduce(_ + _)
      hh.select(col("c_custkey"), col("geohash"),
          round((col("lat_n").cast("double") + 0.5) / 32768.0 * 180.0 - 90.0, 6)
            .as("lat_c"),
          round((col("lon_n").cast("double") + 0.5) / 32768.0 * 360.0 - 180.0, 6)
            .as("lon_c"),
          (g2 === col("g")).as("roundtrip"))
        .orderBy(col("c_custkey"))
    },

    // ---- sample central moments (skewSamp / kurtSamp parity) ----
    // q172's population moments have sample-form siblings in the
    // reference surface: skewSamp = m3ₛ/m2ₛ^1.5 and kurtSamp = m4ₛ/m2ₛ²
    // with n−1 denominators (kurtSamp NOT excess-adjusted). Neither
    // engine's builtin matches these conventions (Spark = population g's,
    // DuckDB = bias-adjusted G-statistics), so BOTH sides state the
    // formulas from raw two-pass central-moment sums — convention pinned
    // by construction, not by luck. (The endpoint-slope boundingRatio is
    // q227's op.) One shuffle (the group-by), map-side-combinable sums;
    // the mean join broadcasts (≤ |segments|).
    Q("q287_sample_moments",
      """WITH mu AS (SELECT c_mktsegment, avg(c_acctbal) AS m
        |  FROM customer GROUP BY c_mktsegment),
        |mom AS (SELECT c.c_mktsegment,
        |    count(*) AS n,
        |    sum(pow(c_acctbal - m, 2)) / (count(*) - 1) AS m2s,
        |    sum(pow(c_acctbal - m, 3)) / (count(*) - 1) AS m3s,
        |    sum(pow(c_acctbal - m, 4)) / (count(*) - 1) AS m4s
        |  FROM customer c JOIN mu USING (c_mktsegment)
        |  GROUP BY c.c_mktsegment)
        |SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
        |  round(m3s / pow(m2s, 1.5), 6) AS skew_samp,
        |  round(m4s / (m2s * m2s), 6) AS kurt_samp
        |FROM mom
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer")
      val mu = cust.groupBy(col("c_mktsegment")).agg(avg(col("c_acctbal")).as("m"))
      val d = col("c_acctbal") - col("m")
      val nm1 = count(lit(1)) - 1
      val mom = cust.join(broadcast(mu), Seq("c_mktsegment"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          (sum(pow(d, 2)) / nm1).as("m2s"),
          (sum(pow(d, 3)) / nm1).as("m3s"),
          (sum(pow(d, 4)) / nm1).as("m4s"))
      mom.select(col("c_mktsegment"), col("n").cast("long").as("n"),
          round(col("m3s") / pow(col("m2s"), 1.5), 6).as("skew_samp"),
          round(col("m4s") / (col("m2s") * col("m2s")), 6).as("kurt_samp"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- CIDR containment join (isIPAddressInRange / IPv4CIDRToRange
    //      parity) ----
    // Per synthetic /p block (p = 8 + nationkey mod 17 ∈ [8, 24], network
    // = masked hash), count the customer IPs (q177's integer synthesis)
    // it contains. The JOIN SHAPE is the point: containment is a
    // variable-length prefix predicate — a theta join naively — but with
    // p ≥ 8 every block lies inside exactly one /8, so the probe becomes
    // an EQUI-join on the /8 octet plus a codegen'd residual shift
    // compare: the q152 bucket idiom on address space. At 100 TB (a
    // routing table of millions of blocks, billions of flows) that
    // equi-join hash-partitions like any other; blocks with p < 8 would
    // explode into their ≤ 2^(8−p) /8 buckets — noted, not needed here.
    // The oracle states the naive prefix predicate; masks are pure
    // integer arithmetic (shifts and mods), bit-identical.
    Q("q291_cidr_join",
      """WITH ip AS (SELECT c_custkey,
        |    (c_custkey * 2654435761) % 4294967296 AS ip FROM customer),
        |blk AS (SELECT n_nationkey, 8 + (n_nationkey % 17) AS p,
        |    (CAST(n_nationkey AS BIGINT) * 122949829) % 4294967296 AS raw
        |  FROM nation),
        |b2 AS (SELECT n_nationkey, p,
        |    raw - (raw % CAST(pow(2, 32 - p) AS BIGINT)) AS net FROM blk)
        |SELECT n_nationkey,
        |  CAST(net >> 24 AS VARCHAR) || '.' ||
        |  CAST((net >> 16) % 256 AS VARCHAR) || '.' ||
        |  CAST((net >> 8) % 256 AS VARCHAR) || '.' ||
        |  CAST(net % 256 AS VARCHAR) || '/' || CAST(p AS VARCHAR) AS cidr,
        |  CAST(count(ip.c_custkey) AS BIGINT) AS n_ips
        |FROM b2 LEFT JOIN ip ON (ip.ip >> (32 - p)) = (net >> (32 - p))
        |GROUP BY n_nationkey, cidr
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val ips = t(s, dir, "customer")
        .select(col("c_custkey"),
          ((col("c_custkey") * lit(2654435761L)) % lit(4294967296L)).as("ip"))
        .withColumn("bkt", expr("ip >> 24"))
      val blocks = t(s, dir, "nation")
        .select(col("n_nationkey"),
          (lit(8) + col("n_nationkey") % 17).as("p"),
          ((col("n_nationkey") * lit(122949829L)) % lit(4294967296L)).as("raw"))
        .select(col("n_nationkey"), col("p"),
          (col("raw") - (col("raw") % expr("CAST(pow(2, 32 - p) AS BIGINT)")))
            .as("net"))
        .withColumn("bkt", expr("net >> 24"))
      val dotted = concat(
        expr("CAST(net >> 24 AS STRING)"), lit("."),
        expr("CAST((net >> 16) % 256 AS STRING)"), lit("."),
        expr("CAST((net >> 8) % 256 AS STRING)"), lit("."),
        expr("CAST(net % 256 AS STRING)"), lit("/"), col("p").cast("string"))
      broadcast(blocks)
        .join(ips,
          blocks("bkt") === ips("bkt") &&
            expr("(ip >> (32 - p)) = (net >> (32 - p))"), "left")
        .groupBy(col("n_nationkey"), dotted.as("cidr"))
        .agg(count(col("c_custkey")).cast("long").as("n_ips"))
        .orderBy(col("n_nationkey"))
    }
  )

  /** Canonical geohash base32 alphabet (no a/i/l/o). */
  private val GeoAlpha = "0123456789bcdefghjkmnpqrstuvwxyz"
}
