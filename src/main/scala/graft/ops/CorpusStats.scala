package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t
import TextCommon.wordsCol

/** Corpus-scaling-law statistics: the two power-law fits every
  * LLM-training-data audit runs before sizing a tokenizer or
  * deduplication pass — Zipf's rank-frequency exponent (is the token
  * distribution natural-language-shaped, or has boilerplate/dedup skewed
  * it?) and Heaps' vocabulary-growth exponent (how fast does vocabulary
  * grow as the corpus accretes — the number that predicts OOV rates and
  * vocab-table sizes at 100 TB).
  *
  * Cross-engine discipline (the q203 pattern): every regression input is
  * a 9dp-rounded ln() scaled to an exact DECIMAL(38,0) integer (ln is not
  * libm-portable — 1-ulp divergence measured round 9, NEXT.md), moments
  * sum exactly, and the one double formula per statistic is written with
  * identical operation order in both engines before its 6dp round.
  *
  * Scale: the word-frequency aggregate is one map-side-combined groupBy;
  * the per-language top-200 rank is a bounded per-group window; the Heaps
  * checkpoints avoid any global window — checkpoint membership is pure
  * arithmetic on doc_id against a broadcast 1-row max, buckets collapse
  * to ≤ 8 rows, and the prefix sum runs over that 8-row frame only.
  */
object CorpusStats {

  /** Shared OLS-from-exact-moments select: slope/intercept/r2 of y on x
    * where x/y are DECIMAL(38,0) scaled lns; the 1e9 scale cancels in
    * slope and r2 and divides out of the intercept. */
  private def fitCols(df: DataFrame): DataFrame = {
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val cov = nD * col("sxy").cast("double") - sxD * syD
    val varx = nD * col("sxx").cast("double") - sxD * sxD
    val vary = nD * col("syy").cast("double") - syD * syD
    // degenerate spreads (constant x or y — e.g. a corpus whose vocabulary
    // never grows) yield NULL, not a division error (ANSI divide throws)
    df.select(col("*"),
      when(varx === 0, lit(null)).otherwise(round(cov / varx, 6)).as("slope"),
      when(varx === 0, lit(null))
        .otherwise(round((syD - (cov / varx) * sxD) / nD / 1e9, 6)).as("intercept"),
      when(varx * vary === 0, lit(null))
        .otherwise(round(cov * cov / (varx * vary), 6)).as("r2"))
  }

  private val fitSqlCols = {
    val cov = """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"""
    val varx = """(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""
    val vary = """(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"""
    s"""CASE WHEN $varx = 0 THEN NULL
      |    ELSE round($cov / $varx, 6) END AS slope,
      |  CASE WHEN $varx = 0 THEN NULL
      |    ELSE round((CAST(sy AS DOUBLE) - ($cov / $varx) * CAST(sx AS DOUBLE))
      |      / CAST(n AS DOUBLE) / 1e9, 6) END AS intercept,
      |  CASE WHEN $varx * $vary = 0 THEN NULL
      |    ELSE round($cov * $cov / ($varx * $vary), 6) END AS r2""".stripMargin
  }

  def qs: Seq[Q] = mainQs ++ extraQs

  private val mainQs: Seq[Q] = Seq(

    // ---- Zipf rank-frequency fit (per language) ----
    // ln(freq) regressed on ln(rank) over each language's top-200 words:
    // slope ≈ −1 for natural text. Rank ties broken by word so the rank
    // assignment is total and identical across engines.
    Q("q258_zipf_fit",
      s"""WITH w AS (SELECT lang, word, count(*) AS freq
        |  FROM (SELECT lang,
        |          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        |        FROM documents)
        |  GROUP BY lang, word),
        |r AS (SELECT lang, freq,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY freq DESC, word) AS rn
        |  FROM w),
        |pts AS (SELECT lang,
        |    CAST(round(ln(CAST(rn AS DOUBLE)), 9) * 1e9 AS DECIMAL(38,0)) AS x,
        |    CAST(round(ln(CAST(freq AS DOUBLE)), 9) * 1e9 AS DECIMAL(38,0)) AS y
        |  FROM r WHERE rn <= 200),
        |m AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM pts GROUP BY lang)
        |SELECT lang, CAST(n AS BIGINT) AS n,
        |  $fitSqlCols
        |FROM m ORDER BY lang""".stripMargin) { (s, dir) =>
      val w = t(s, dir, "documents")
        .select(col("lang"), explode(wordsCol).as("word"))
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("freq"))
      val r = w.withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("freq").desc, col("word"))))
        .filter(col("rn") <= 200)
      val dec = "decimal(38,0)"
      val pts = r.select(col("lang"),
        (round(log(col("rn").cast("double")), 9) * lit(1e9)).cast(dec).as("x"),
        (round(log(col("freq").cast("double")), 9) * lit(1e9)).cast(dec).as("y"))
      val m = pts.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      fitCols(m)
        .select(col("lang"), col("n").cast("long").as("n"),
          col("slope"), col("intercept"), col("r2"))
        .orderBy(col("lang"))
    },

    // ---- Heaps vocabulary-growth fit ----
    // V(N) ≈ K·N^β measured at 8 corpus checkpoints: checkpoint k covers
    // docs with doc_id ≤ max_id·k/8. The vocabulary UNIT is the 3-word
    // shingle, not the bare token — this corpus draws from a fixed word
    // list, so token vocabulary saturates instantly (measured: 31 words,
    // all first-seen in bucket 1) while shingle vocabulary genuinely
    // grows; for any unit the fit guards degenerate zero-variance input
    // with NULL. A shingle contributes to vocabulary from its FIRST
    // document on, so V_k = #{grams: min(doc_id) in checkpoint ≤ k} —
    // bucket = ceil(8·id/max_id) is exact integer arithmetic (the
    // rational can't sit within an ulp of a wrong integer), clamped to
    // ≥ 1 for doc_id 0. No global window: buckets collapse to ≤ 8 rows
    // before the prefix sum.
    Q("q259_heaps_law",
      s"""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
        |w AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\\s+') AS words
        |  FROM documents),
        |tok AS (SELECT doc_id,
        |    unnest(CASE WHEN len(words) >= 3 THEN
        |        list_transform(range(1, len(words) - 1),
        |          i -> array_to_string(list_slice(words, i, i + 2), ' '))
        |      ELSE [] END) AS gram
        |  FROM w),
        |nb AS (SELECT greatest(CAST(ceil(doc_id * 8.0 / mx.m) AS BIGINT), 1) AS b,
        |    sum(cnt) AS toks
        |  FROM (SELECT doc_id, count(*) AS cnt FROM tok GROUP BY doc_id) d, mx
        |  GROUP BY 1),
        |vb AS (SELECT greatest(CAST(ceil(fd * 8.0 / mx.m) AS BIGINT), 1) AS b,
        |    count(*) AS words
        |  FROM (SELECT gram, min(doc_id) AS fd FROM tok GROUP BY gram) g, mx
        |  GROUP BY 1),
        |spine AS (SELECT unnest(range(1, 9)) AS k),
        |cum AS (SELECT k,
        |    sum(coalesce(nb.toks, 0)) OVER (ORDER BY k) AS n_tok,
        |    sum(coalesce(vb.words, 0)) OVER (ORDER BY k) AS vocab
        |  FROM spine LEFT JOIN nb ON nb.b = spine.k
        |    LEFT JOIN vb ON vb.b = spine.k),
        |pts AS (SELECT
        |    CAST(round(ln(CAST(n_tok AS DOUBLE)), 9) * 1e9 AS DECIMAL(38,0)) AS x,
        |    CAST(round(ln(CAST(vocab AS DOUBLE)), 9) * 1e9 AS DECIMAL(38,0)) AS y
        |  FROM cum WHERE n_tok > 0 AND vocab > 0),
        |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM pts)
        |SELECT CAST(n AS BIGINT) AS n_points,
        |  (SELECT CAST(max(n_tok) AS BIGINT) FROM cum) AS n_tokens,
        |  (SELECT CAST(max(vocab) AS BIGINT) FROM cum) AS vocabulary,
        |  $fitSqlCols
        |FROM m""".stripMargin) { (s, dir) =>
      heapsFrame(s, t(s, dir, "documents"))
    }
  )

  private val extraQs: Seq[Q] = Seq(

    // ---- unseen-species estimation: Good–Turing mass + Chao1 richness ----
    // The coverage audit behind "have we crawled enough": from the
    // frequency-of-frequencies of 3-word shingles (the q259 unit),
    // Good–Turing's unseen-probability mass n₁/N and the Chao1 richness
    // floor V + n₁²/(2n₂) — how much vocabulary the corpus has NOT seen
    // yet. Everything is exact integer arithmetic off two nested
    // map-side-combined aggregates (gram counts → count-of-counts; the
    // second one's key space is tiny); the two output ratios are single
    // divisions rounded at 6. Per language, so the audit localizes.
    Q("q280_chao1",
      """WITH w AS (SELECT lang,
        |    string_split_regex(lower(trim(text)), '\s+') AS words
        |  FROM documents),
        |tok AS (SELECT lang,
        |    unnest(CASE WHEN len(words) >= 3 THEN
        |        list_transform(range(1, len(words) - 1),
        |          i -> array_to_string(list_slice(words, i, i + 2), ' '))
        |      ELSE [] END) AS gram
        |  FROM w),
        |g AS (SELECT lang, gram, count(*) AS c FROM tok GROUP BY 1, 2),
        |ff AS (SELECT lang, c, count(*) AS n_c FROM g GROUP BY 1, 2),
        |m AS (SELECT lang,
        |    sum(n_c) AS v,
        |    sum(c * n_c) AS n_tok,
        |    coalesce(sum(CASE WHEN c = 1 THEN n_c END), 0) AS n1,
        |    coalesce(sum(CASE WHEN c = 2 THEN n_c END), 0) AS n2
        |  FROM ff GROUP BY 1)
        |SELECT lang, CAST(v AS BIGINT) AS vocabulary,
        |  CAST(n_tok AS BIGINT) AS n_tokens,
        |  CAST(n1 AS BIGINT) AS n_singletons,
        |  CAST(n2 AS BIGINT) AS n_doubletons,
        |  round(CAST(n1 AS DOUBLE) / n_tok, 6) AS unseen_mass,
        |  CASE WHEN n2 = 0 THEN NULL
        |    ELSE round(v + CAST(n1 AS DOUBLE) * n1 / (2.0 * n2), 6)
        |  END AS chao1
        |FROM m ORDER BY lang""".stripMargin) { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(col("lang"), wordsCol.as("w"))
        .select(col("lang"), explode(expr(
          """CASE WHEN size(w) >= 3 THEN
            |  transform(sequence(1, size(w) - 2),
            |    i -> array_join(slice(w, i, 3), ' '))
            |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("gram"))
      val g = tok.groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("c"))
      val ff = g.groupBy(col("lang"), col("c")).agg(count(lit(1)).as("n_c"))
      val m = ff.groupBy(col("lang"))
        .agg(sum(col("n_c")).as("v"),
          sum(col("c") * col("n_c")).as("n_tok"),
          coalesce(sum(when(col("c") === 1, col("n_c"))), lit(0L)).as("n1"),
          coalesce(sum(when(col("c") === 2, col("n_c"))), lit(0L)).as("n2"))
      m.select(col("lang"), col("v").cast("long").as("vocabulary"),
          col("n_tok").cast("long").as("n_tokens"),
          col("n1").cast("long").as("n_singletons"),
          col("n2").cast("long").as("n_doubletons"),
          round(col("n1").cast("double") / col("n_tok"), 6).as("unseen_mass"),
          when(col("n2") === 0, lit(null))
            .otherwise(round(col("v") + col("n1").cast("double") * col("n1")
              / (lit(2.0) * col("n2")), 6)).as("chao1"))
        .orderBy(col("lang"))
    },

    // ---- per-source KL-divergence skew audit ----
    // Which sources' word distributions diverge from the corpus — the
    // text twin of q208's PSI, and the audit that catches a crawler
    // feeding boilerplate: KL(p_source ‖ p_corpus) over the corpus
    // top-200 words plus an OTHER bucket (shared support, so no zero
    // denominators), with the single word driving the skew reported via
    // a lexicographic struct max. Terms quantize at 9 dp into
    // DECIMAL(18,9) before the per-source sum (201 rounded ln terms —
    // plain double summation order would diverge across engines, the
    // q101 fold lesson); the vocabulary cut is one TakeOrdered top-200
    // broadcast against the per-source counts.
    Q("q281_source_kl",
      """WITH w AS (SELECT source,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents),
        |cw AS (SELECT word, count(*) AS c FROM w GROUP BY 1),
        |top AS (SELECT word, c FROM cw ORDER BY c DESC, word LIMIT 200),
        |nc AS (SELECT sum(c) AS n FROM cw),
        |sw AS (SELECT source, word, count(*) AS c FROM w GROUP BY 1, 2),
        |ns AS (SELECT source, sum(c) AS n FROM sw GROUP BY 1),
        |stop AS (SELECT sw.source AS source, sw.word AS word, sw.c AS c
        |  FROM sw JOIN top ON sw.word = top.word),
        |rows_ AS (
        |  SELECT s.source AS source, t.word AS word,
        |    coalesce(st.c, 0) AS cs, t.c AS cc, s.n AS nsrc, nc.n AS ncor
        |  FROM ns s CROSS JOIN top t
        |    LEFT JOIN stop st ON st.source = s.source AND st.word = t.word,
        |    nc
        |  UNION ALL
        |  SELECT s.source, '__other__',
        |    s.n - coalesce((SELECT sum(c) FROM stop WHERE stop.source = s.source), 0),
        |    nc.n - (SELECT sum(c) FROM top), s.n, nc.n
        |  FROM ns s, nc),
        |terms AS (SELECT source, word,
        |    CAST(round(CASE WHEN cs = 0 THEN 0.0
        |      ELSE (CAST(cs AS DOUBLE) / nsrc)
        |        * ln((CAST(cs AS DOUBLE) / nsrc) / (CAST(cc AS DOUBLE) / ncor))
        |      END, 9) AS DECIMAL(18,9)) AS term
        |  FROM rows_)
        |SELECT source,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS kl,
        |  (max(struct_pack(t := term, w := word))).w AS top_word,
        |  CAST((max(struct_pack(t := term, w := word))).t AS DOUBLE) AS top_term
        |FROM terms GROUP BY source
        |ORDER BY source""".stripMargin) { (s, dir) =>
      val w = t(s, dir, "documents")
        .select(col("source"), explode(wordsCol).as("word"))
      val cw = w.groupBy(col("word")).agg(count(lit(1)).as("c"))
      val top = cw.orderBy(col("c").desc, col("word")).limit(200)
      val nc = cw.agg(sum(col("c")).as("ncor"))
      val sw = w.groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
      val ns = sw.groupBy(col("source")).agg(sum(col("c")).as("nsrc"))
      val stop = sw.join(broadcast(top.select(col("word"))), Seq("word"))
      val grid = ns.crossJoin(broadcast(top.select(col("word"), col("c").as("cc"))))
        .join(stop.select(col("source"), col("word"), col("c").as("cs")),
          Seq("source", "word"), "left")
        .select(col("source"), col("word"), coalesce(col("cs"), lit(0L)).as("cs"),
          col("cc"), col("nsrc"))
      val otherRow = {
        val sTop = stop.groupBy(col("source")).agg(sum(col("c")).as("cs_top"))
        val ccOther = top.agg(sum(col("c")).as("cc_top"))
        ns.join(sTop, Seq("source"), "left")
          .crossJoin(broadcast(ccOther)).crossJoin(broadcast(nc))
          .select(col("source"), lit("__other__").as("word"),
            (col("nsrc") - coalesce(col("cs_top"), lit(0L))).as("cs"),
            (col("ncor") - col("cc_top")).as("cc"), col("nsrc"))
      }
      val rows = grid.unionByName(otherRow).crossJoin(broadcast(nc))
      val ps = col("cs").cast("double") / col("nsrc")
      val pc = col("cc").cast("double") / col("ncor")
      val terms = rows.select(col("source"), col("word"),
        round(when(col("cs") === 0, lit(0.0)).otherwise(ps * log(ps / pc)), 9)
          .cast("decimal(18,9)").as("term"))
      val best = max(struct(col("term").as("t"), col("word").as("w")))
      terms.groupBy(col("source"))
        .agg(round(sum(col("term")).cast("double"), 6).as("kl"),
          best.getField("w").as("top_word"),
          best.getField("t").cast("double").as("top_term"))
        .orderBy(col("source"))
    })

  /** q259's Spark side over any (doc_id, text, …) frame — the streaming
    * refresh composition (StreamingCorpusStatsSpec) recomputes it over
    * the accumulated idempotent store, the batch query over the table. */
  private[graft] def heapsFrame(s: org.apache.spark.sql.SparkSession,
      docs: DataFrame): DataFrame = {
      val tok = docs
        .select(col("doc_id"), wordsCol.as("w"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(w) >= 3 THEN
            |  transform(sequence(1, size(w) - 2),
            |    i -> array_join(slice(w, i, 3), ' '))
            |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("gram"))
      val mx = docs.agg(max(col("doc_id")).as("m"))
      def bucket(c: org.apache.spark.sql.Column) =
        greatest(ceil(c * lit(8.0) / col("m")).cast("long"), lit(1L))
      val nb = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(mx))
        .groupBy(bucket(col("doc_id")).as("b")).agg(sum(col("cnt")).as("toks"))
      val vb = tok.groupBy(col("gram")).agg(min(col("doc_id")).as("fd"))
        .crossJoin(broadcast(mx))
        .groupBy(bucket(col("fd")).as("b")).agg(count(lit(1)).as("words"))
      val spine = s.range(1, 9).select(col("id").as("k"))
      val w8 = Window.orderBy(col("k")) // ≤ 8-row frame — bounded by design
      val cum = spine
        .join(nb.withColumnRenamed("b", "k"), Seq("k"), "left")
        .join(vb.withColumnRenamed("b", "k"), Seq("k"), "left")
        .select(col("k"),
          sum(coalesce(col("toks"), lit(0L))).over(w8).as("n_tok"),
          sum(coalesce(col("words"), lit(0L))).over(w8).as("vocab"))
      val dec = "decimal(38,0)"
      val pts = cum.filter(col("n_tok") > 0 && col("vocab") > 0)
        .select(
          (round(log(col("n_tok").cast("double")), 9) * lit(1e9)).cast(dec).as("x"),
          (round(log(col("vocab").cast("double")), 9) * lit(1e9)).cast(dec).as("y"))
      val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
      val tot = cum.agg(max(col("n_tok")).cast("long").as("n_tokens"),
        max(col("vocab")).cast("long").as("vocabulary"))
      fitCols(m.crossJoin(broadcast(tot)))
        .select(col("n").cast("long").as("n_points"), col("n_tokens"),
          col("vocabulary"), col("slope"), col("intercept"), col("r2"))
  }
}
