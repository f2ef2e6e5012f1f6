package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.Q
import graft.schema.Tables.t

/** Distinct-set sketches and set algebra over audience/user sets —
  * ClickHouse's `uniqTheta` family (KMV k-minimum-values sketch with
  * union/intersect estimates), the `groupBitmapAnd/Or/Xor` bitmap
  * aggregate surface, the `sumForEach`/`avgForEach` array combinators,
  * and `anyHeavy`/`mode` + `entropy` per group
  * (cf. /root/reference/cmd/kafka-consumer/prepare-functions.go:161-176 — the reference's
  * users run these at the ClickHouse destination).
  *
  * The KMV estimator here is CHECKED-approximate, the q167 discipline:
  * hashes are md5 hex (identical in both engines), the k-th minimum is
  * a pure function of the data, and the estimate arithmetic is exact
  * binary fractions — so the DuckDB oracle recomputes the SAME sketch
  * and the whole operator is hash-checked STRICT, not rows-only. */
object SetSketches {

  /** Uniform (0,1] fraction of an md5 hex string's first 12 nibbles —
    * Σ digit_i/16^i. Every term and partial sum is an exact binary
    * fraction (16^i is a power of two, 12 nibbles = 48 bits < the
    * 53-bit mantissa), so both engines produce the bit-identical double
    * regardless of fold order. */
  private def fracSpark(c: String): String =
    s"""aggregate(transform(sequence(1, 12),
       |  i -> (instr('0123456789abcdef', substring($c, i, 1)) - 1)
       |       / power(16, i)),
       |  0D, (a, x) -> a + x)""".stripMargin
  private def fracDuck(c: String): String =
    s"""list_sum(list_transform(range(1, 13),
       |  i -> (strpos('0123456789abcdef', substr($c, i, 1)) - 1)
       |       / power(16, i)))""".stripMargin

  private val K = 64

  /** Per-type KMV sketch as a typed bounded Aggregator (MinK over the
    * md5'd ids): partial state ≤ K strings per partition, map-side
    * combined — the corpus never pays a distinct-users exchange. */
  private def typeSketches(s: org.apache.spark.sql.SparkSession,
      ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val mk = graft.functions.MinK(K)
    ev.select(col("event_type"), md5(col("user_id").cast("string")).as("hx"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(mk.toColumn.name("sk"))
      .toDF("event_type", "sk")
  }

  private def estCol(kth: Column, skSize: Column): Column =
    when(kth.isNull, skSize.cast("double"))
      .otherwise(lit(K - 1) / expr(fracSpark("kth")))

  def qs: Seq[Q] = Seq(

    // ---- KMV distinct sketch per segment (uniqTheta parity) ----
    // Estimate distinct users per event type from the K smallest
    // md5(user_id) values. The sketch state is a bounded mergeable
    // vector (functions.MinK): each partition's partial is its own K
    // smallest hashes, merge = K smallest of the union — at 100 TB the
    // shuffle carries |types|·K hashes, not |distinct users|. Fewer
    // than K distinct → the buffer IS the exact set (est = its size).
    // The exact count rides alongside so the error is VISIBLE in the
    // checked output; the estimate itself is deterministic arithmetic
    // on the k-th hash (see fracSpark) — strict, not rows-only.
    Q("q214_kmv_distinct",
      s"""WITH h AS (SELECT DISTINCT event_type,
         |    md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
         |r AS (SELECT event_type, hx,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hx) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS nd
         |  FROM h),
         |k AS (SELECT event_type,
         |    CAST(max(nd) AS BIGINT) AS n_exact,
         |    max(CASE WHEN rn = $K THEN hx END) AS kth,
         |    CAST(sum(CASE WHEN rn <= $K THEN 1 ELSE 0 END) AS BIGINT)
         |      AS sk_size
         |  FROM r GROUP BY event_type)
         |SELECT event_type, n_exact, sk_size,
         |  CASE WHEN kth IS NULL THEN CAST(sk_size AS DOUBLE)
         |       ELSE ${K - 1} / ${fracDuck("kth")} END AS est
         |FROM k ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val sk = typeSketches(s, ev)
        .withColumn("sk_size", size(col("sk")).cast("long"))
        .withColumn("kth",
          when(size(col("sk")) >= K, element_at(col("sk"), K)))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(sk, Seq("event_type"))
        .select(col("event_type"), col("n_exact"), col("sk_size"),
          estCol(col("kth"), col("sk_size")).as("est"))
        .orderBy(col("event_type"))
    },

    // ---- audience set algebra: exact bitmap ops + KMV union/intersect
    //      estimates (groupBitmapAnd/Or/Xor + uniqTheta parity) ----
    // Exact |A|, |B|, |A∩B|, |A∪B|, |AΔB| for the click/purchase
    // audiences from ONE user-keyed aggregate (per-user membership flags
    // then flag sums — the bitmap AND/OR/XOR shape, shuffle keyed on
    // user_id which GROWS with data), plus the KMV estimates: the union
    // sketch is the K smallest of the two sketches' union (a valid KMV
    // union — no rescan), intersection via the ρ·est_union/|sketch|
    // inclusion rule. Arrays never leave the 1-row frame; outputs are
    // scalars.
    Q("q215_audience_algebra",
      s"""WITH f AS (SELECT user_id,
         |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY user_id),
         |e AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
         |    CAST(sum(b) AS BIGINT) AS n_b,
         |    CAST(sum(a * b) AS BIGINT) AS n_and,
         |    CAST(count(*) AS BIGINT) AS n_or,
         |    CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT) AS n_xor
         |  FROM f),
         |h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1, 2),
         |r AS (SELECT event_type, hx,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hx) AS rn
         |  FROM h),
         |sk AS (SELECT event_type, list(hx ORDER BY hx) AS arr
         |  FROM r WHERE rn <= $K GROUP BY event_type),
         |w AS (SELECT
         |    (SELECT arr FROM sk WHERE event_type = 'click') AS ca,
         |    (SELECT arr FROM sk WHERE event_type = 'purchase') AS pa),
         |m AS (SELECT
         |    list_slice(list_sort(list_distinct(ca || pa)), 1, $K) AS un,
         |    ca, pa FROM w),
         |g AS (SELECT CAST(len(un) AS BIGINT) AS u_size,
         |    CASE WHEN len(un) >= $K THEN un[$K] END AS kth,
         |    CAST(len(list_filter(un,
         |      x -> list_contains(ca, x) AND list_contains(pa, x)))
         |      AS BIGINT) AS rho
         |  FROM m),
         |est AS (SELECT u_size, rho,
         |    CASE WHEN kth IS NULL THEN CAST(u_size AS DOUBLE)
         |         ELSE ${K - 1} / ${fracDuck("kth")} END AS est_union
         |  FROM g)
         |SELECT e.n_a, e.n_b, e.n_and, e.n_or, e.n_xor,
         |  est.u_size, est.rho, est.est_union,
         |  (est.rho * est.est_union) / est.u_size AS est_inter
         |FROM e, est""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
      val flags = ev.groupBy(col("user_id")).agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("a"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("b"))
      val exact = flags.agg(
        sum(col("a")).cast("long").as("n_a"),
        sum(col("b")).cast("long").as("n_b"),
        sum(col("a") * col("b")).cast("long").as("n_and"),
        count(lit(1)).cast("long").as("n_or"),
        sum(when(col("a") =!= col("b"), 1).otherwise(0)).cast("long").as("n_xor"))
      val pair = typeSketches(s, ev).agg(
        first(when(col("event_type") === "click", col("sk")), ignoreNulls = true)
          .as("ca"),
        first(when(col("event_type") === "purchase", col("sk")), ignoreNulls = true)
          .as("pa"))
        .withColumn("un",
          slice(array_sort(array_distinct(concat(col("ca"), col("pa")))), 1, K))
        .withColumn("u_size", size(col("un")).cast("long"))
        .withColumn("kth", when(size(col("un")) >= K, element_at(col("un"), K)))
        .withColumn("rho", size(filter(col("un"),
          x => array_contains(col("ca"), x) && array_contains(col("pa"), x)))
          .cast("long"))
        .withColumn("est_union", estCol(col("kth"), col("u_size")))
        .withColumn("est_inter",
          (col("rho") * col("est_union")) / col("u_size"))
        .select("u_size", "rho", "est_union", "est_inter")
      exact.crossJoin(broadcast(pair))
        .select(col("n_a"), col("n_b"), col("n_and"), col("n_or"), col("n_xor"),
          col("u_size"), col("rho"), col("est_union"), col("est_inter"))
    },

    // ---- elementwise array aggregation (sumForEach / avgForEach
    //      parity) ----
    // Per label, the per-position sum and mean of the 64-dim embedding
    // vectors: posexplode keys the shuffle on (label, pos) — ≤
    // |labels|·64 groups, map-side combined so the exchange carries
    // partials, not elements. Each element casts float→double (exact)
    // →DECIMAL(20,6) (both engines round half-away-from-zero) so the
    // sums are order-independent exact decimals; the mean divides the
    // exact sum by the exact count (one IEEE division, no rounding
    // needed — the q199 rule).
    Q("q216_sum_foreach",
      """SELECT label, CAST(i AS BIGINT) AS pos,
        |  CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,6)))
        |    AS DOUBLE) AS s,
        |  CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,6)))
        |    AS DOUBLE) / count(*) AS a
        |FROM embeddings, range(1, 65) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("p0", "x")))
        .select(col("label"), (col("p0") + 1).cast("long").as("pos"),
          col("x").cast("double").cast("decimal(20,6)").as("xd"))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("xd")).cast("double").as("s"),
          (sum(col("xd")).cast("double") / count(lit(1))).as("a"))
        .orderBy(col("label"), col("pos"))
    },

    // ---- modal value + categorical entropy per group (anyHeavy /
    //      mode / entropy parity) ----
    // Per source: the modal language (deterministic count-desc,
    // lang-asc tiebreak — ClickHouse's anyHeavy returns "a" heavy
    // value; the mode with a stated tiebreak is the checkable form),
    // its share, and the Shannon entropy of the language distribution.
    // One (source, lang) cell aggregate; everything downstream folds
    // over ≤ |sources|·|langs| cells (the q200 discipline). Entropy is
    // an ln fold → round(6) (ln is not libm-portable).
    Q("q217_mode_entropy",
      """WITH c AS (SELECT source, lang, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |tt AS (SELECT source, sum(n) AS tot FROM c GROUP BY source),
        |r AS (SELECT c.source, c.lang, c.n, tt.tot,
        |    row_number() OVER (PARTITION BY c.source
        |      ORDER BY c.n DESC, c.lang) AS rn
        |  FROM c JOIN tt USING (source)),
        |e AS (SELECT source,
        |    round(-sum((CAST(n AS DOUBLE) / tot)
        |      * ln(CAST(n AS DOUBLE) / tot)), 6) AS lang_entropy
        |  FROM r GROUP BY source)
        |SELECT r.source, r.lang AS modal_lang, CAST(r.n AS BIGINT) AS n,
        |  CAST(r.tot AS BIGINT) AS tot,
        |  CAST(r.n AS DOUBLE) / r.tot AS share,
        |  e.lang_entropy
        |FROM r JOIN e USING (source) WHERE r.rn = 1
        |ORDER BY r.source""".stripMargin) { (s, dir) =>
      val W = org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      val tot = cells.groupBy(col("source")).agg(sum(col("n")).as("tot"))
      val r = cells.join(tot, Seq("source"))
        .withColumn("rn", row_number().over(
          W.partitionBy(col("source")).orderBy(col("n").desc, col("lang").asc)))
      val ent = cells.join(tot, Seq("source"))
        .groupBy(col("source"))
        .agg(round(-sum((col("n").cast("double") / col("tot"))
          * log(col("n").cast("double") / col("tot"))), 6).as("lang_entropy"))
      r.filter(col("rn") === 1)
        .join(ent, Seq("source"))
        .select(col("source"), col("lang").as("modal_lang"),
          col("n").cast("long").as("n"), col("tot").cast("long").as("tot"),
          (col("n").cast("double") / col("tot")).as("share"),
          col("lang_entropy"))
        .orderBy(col("source"))
    }
  )
}
