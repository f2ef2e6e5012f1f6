package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** ClickHouse external-dictionary surface (`dictGet` /
  * `dictGetOrDefault` / `dictGetHierarchy` / `dictIsIn`): a BOUNDED
  * dimension table loaded once into an in-memory lookup structure,
  * then O(1) per-row lookups with no join and no shuffle — exactly how
  * the destination's users enrich facts without paying a dim exchange
  * (cf. /root/reference/cmd/kafka-consumer/prepare-functions.go's ClickHouse-side query
  * surface).
  *
  * Spark-first shape: the dictionary is the dim table COLLECTED at plan
  * time into MAP literals (`typedLit(Map(...))` → `element_at`), which
  * codegens to a hash probe inside the scan's projection — the honest
  * analogue of ClickHouse's hashed dictionary layout, and strictly
  * better than a broadcast join for the lookup-only case (no build
  * relation, no join node, stays inside one WholeStageCodegen span).
  * Guarded by `graft.dict.maxRows` (default 100k): dictionaries are for
  * BOUNDED dims; a corpus-sized "dictionary" must be a broadcast join
  * instead, and the guard makes that contract loud at plan time. */
object Dictionary {

  def qs: Seq[Q] = Seq(

    // ---- dictGet / dictGetOrDefault / dictGetHierarchy / dictIsIn ----
    // Per nation: its name (dictGet), its region's name through the
    // hierarchy (chained dictGet), the rendered ancestor path
    // (dictGetHierarchy), whether it sits under EUROPE (dictIsIn), and
    // the customer count — plus a deliberately-missing key (nationkey
    // 99) exercising dictGetOrDefault's default on every lookup column.
    // The oracle states the same semantics as LEFT JOINs + coalesce.
    Q("q218_dict_get",
      """WITH keys AS (SELECT DISTINCT c_nationkey AS k FROM customer
        |  UNION ALL SELECT 99),
        |c AS (SELECT c_nationkey AS k, count(*) AS n_cust
        |  FROM customer GROUP BY 1)
        |SELECT keys.k AS nation_key,
        |  coalesce(n.n_name, 'UNKNOWN') AS nation_name,
        |  coalesce(r.r_name, 'UNKNOWN') AS region_name,
        |  CASE WHEN n.n_nationkey IS NULL THEN 'none'
        |       ELSE CAST(n.n_nationkey AS VARCHAR) || '>' ||
        |            CAST(n.n_regionkey AS VARCHAR) END AS hierarchy,
        |  CASE WHEN r.r_name = 'EUROPE' THEN 1 ELSE 0 END AS in_europe,
        |  CAST(coalesce(c.n_cust, 0) AS BIGINT) AS n_cust
        |FROM keys
        |LEFT JOIN nation n ON keys.k = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |LEFT JOIN c ON keys.k = c.k
        |ORDER BY nation_key""".stripMargin) { (s, dir) =>
      val maxRows =
        s.conf.getOption("graft.dict.maxRows").map(_.toLong).getOrElse(100000L)
      // load the dictionaries ONCE (bounded dims — the dictionary
      // contract; the guard turns a corpus-sized misuse into a loud
      // plan-time error instead of a silent driver OOM)
      def loadDict(name: String, kv: org.apache.spark.sql.DataFrame)
          : Map[Int, String] = {
        val rows = kv.limit((maxRows + 1).toInt).collect()
        require(rows.length <= maxRows,
          s"dictionary '$name' exceeds graft.dict.maxRows=$maxRows — " +
            "use a broadcast join for corpus-sized dims")
        rows.map(r => r.getInt(0) -> r.getString(1)).toMap
      }
      val nationName = loadDict("nation_name", t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name")))
      val nationParent = loadDict("nation_parent", t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey").cast("string")))
      val regionName = loadDict("region_name", t(s, dir, "region")
        .select(col("r_regionkey"), col("r_name")))
      val nName = typedLit(nationName)
      val nParent = typedLit(nationParent)
      val rName = typedLit(regionName)
      val keys = t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .distinct()
        .unionByName(s.range(1).select(lit(99).as("k")))
      val counts = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("k"))
        .agg(count(lit(1)).as("n_cust"))
      keys.join(counts, Seq("k"), "left")
        .select(col("k").as("nation_key"),
          // dictGetOrDefault('nation', 'name', k, 'UNKNOWN')
          coalesce(element_at(nName, col("k")), lit("UNKNOWN")).as("nation_name"),
          // chained dictGet through the hierarchy: nation → region
          coalesce(element_at(rName,
            element_at(nParent, col("k")).cast("int")), lit("UNKNOWN"))
            .as("region_name"),
          // dictGetHierarchy: rendered ancestor chain
          when(element_at(nParent, col("k")).isNull, lit("none"))
            .otherwise(concat(col("k").cast("string"), lit(">"),
              element_at(nParent, col("k")))).as("hierarchy"),
          // dictIsIn(nation, EUROPE)
          when(element_at(rName,
            element_at(nParent, col("k")).cast("int")) === "EUROPE", lit(1))
            .otherwise(lit(0)).as("in_europe"),
          coalesce(col("n_cust"), lit(0L)).cast("long").as("n_cust"))
        .orderBy(col("nation_key"))
    }
  )
}
