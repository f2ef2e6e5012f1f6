package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Training-data curation operators beyond the dedup/analysis families:
  * chunk-level duplication, mixture balancing, embedding quantization,
  * entropy-based quality, corpus shape stats, and curriculum ordering.
  * Every query is DuckDB-oracle-checked (deterministic md5-derived
  * randomness; fixed-order floating summation where sums cross rows).
  *
  * Scale notes per operator are inline — the common theme: one narrow
  * shuffle on the natural key (doc/chunk/source), broadcast for the
  * corpus-level scalars, top-k instead of global sorts.
  */
object Curation {

  private val wordsCol: Column = split(lower(trim(col("text"))), "\\s+")

  /** DuckDB hex→BIGINT parse of `n` chars of md5 hex (no conv() in DuckDB);
    * mirrors Spark's conv(substring(m, 1, n), 16, 10). */
  private def duckHex(expr: String, n: Int): String =
    s"""list_sum(list_transform(range(1, ${n + 1}),
       |      j -> CAST((strpos('0123456789abcdef', substr($expr, j, 1)) - 1) AS BIGINT)
       |           * (CAST(1 AS BIGINT) << (4 * ($n - j)))))""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- chunk-level exact dedup ----
    // Document-level dedup misses partial duplication (a page quoting
    // another, boilerplate sections); splitting every doc into
    // non-overlapping 10-word chunks and hashing them finds chunks shared
    // across documents. One shuffle on the 32-byte chunk hash — the same
    // scale shape as exact doc dedup (q40), fanout bounded at |words|/10
    // rows per doc.
    Q("q85_chunk_dedup",
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        |           FROM documents),
        |ch AS (SELECT DISTINCT doc_id,
        |    md5(unnest(list_transform(range(0, len(words) // 10),
        |      i -> array_to_string(words[i*10+1 : i*10+10], ' ')))) AS fp
        |  FROM w)
        |SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS keeper_id
        |FROM ch
        |GROUP BY fp
        |HAVING count(*) >= 2
        |ORDER BY fp""".stripMargin) { (s, dir) =>
      val chunksExpr = expr(
        """CASE WHEN size(words) >= 10 THEN
          |  transform(sequence(0, size(words) DIV 10 - 1),
          |    i -> concat_ws(' ', slice(words, i*10+1, 10)))
          |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)
      t(s, dir, "documents")
        .select(col("doc_id"), wordsCol.as("words"))
        .select(col("doc_id"), explode(chunksExpr).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("fp"))
        .distinct()
        .groupBy(col("fp"))
        .agg(count(lit(1)).cast("long").as("n_docs"), min(col("doc_id")).as("keeper_id"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("fp"))
    },

    // ---- mixture-weight application: balance sources by downsampling ----
    // The acting half of q80's mixture weights: downsample every source to
    // a balanced budget (here 50% of the smallest source's size, so the
    // sampling filter genuinely drops rows even on a balanced corpus) with
    // a DETERMINISTIC per-doc coin (md5(doc_id) as a uniform in [0,1) —
    // reproducible across runs and engines, no RNG state). At 100 TB this
    // is one map-side filter per row against a broadcast |sources|-row
    // rate table: no shuffle of the corpus at all; the verification
    // aggregate here is for the oracle.
    Q("q86_mixture_apply",
      s"""WITH u AS (SELECT doc_id, source,
         |    ${duckHex("substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)", 8)} / 4294967296.0 AS coin
         |  FROM documents),
         |c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |m AS (SELECT min(n) AS target FROM c)
         |SELECT u.source AS source, CAST(c.n AS BIGINT) AS n_docs,
         |  CAST(count(CASE WHEN coin < target * 0.5 / c.n THEN 1 END) AS BIGINT) AS n_kept,
         |  round(target * 0.5 / c.n, 6) AS keep_rate
         |FROM u JOIN c ON u.source = c.source, m
         |GROUP BY u.source, c.n, m.target
         |ORDER BY u.source""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val coin = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") / lit(4294967296.0)
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val target = counts.agg(min(col("n")).as("target"))
      val rate = col("target") * lit(0.5) / col("n")
      docs.select(col("doc_id"), col("source"), coin.as("coin"))
        .join(broadcast(counts), Seq("source"))
        .crossJoin(broadcast(target))
        .groupBy(col("source"), col("n"), col("target"))
        .agg(count(when(col("coin") < rate, 1)).cast("long").as("n_kept"))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          col("n_kept"), round(rate, 6).as("keep_rate"))
        .orderBy(col("source"))
    },

    // ---- int8 scalar quantization of embeddings ----
    // The storage/serving compression step for a 100 TB vector corpus:
    // per-vector symmetric int8 quantization (scale = 127 / max|x|,
    // q_i = round(x_i · scale)). Pure map-side arithmetic over the array
    // column — no shuffle, codegen'd higher-order functions. Emitted as
    // per-vector summary scalars (scale, Σq, dim): the checker can't hash
    // array cells, and the sum pins every quantized component exactly.
    // round-half-up is spelled floor(x + 0.5) so both engines agree
    // bit-for-bit (their native round() ties differ).
    Q("q87_embed_quantize",
      """SELECT vec_id, round(127.0 / mx, 6) AS scale,
        |  CAST(list_sum(list_transform(emb,
        |    x -> CAST(floor(CAST(x AS DOUBLE) / mx * 127.0 + 0.5) AS BIGINT))) AS BIGINT) AS q_sum,
        |  CAST(len(emb) AS BIGINT) AS dim
        |FROM (SELECT vec_id, embedding AS emb,
        |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |      FROM embeddings)
        |WHERE mx > 0
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("emb"),
          expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))").as("mx"))
        .filter(col("mx") > 0)
        .select(col("vec_id"), round(lit(127.0) / col("mx"), 6).as("scale"),
          expr("""aggregate(emb, CAST(0 AS BIGINT),
                 |  (acc, x) -> acc + CAST(floor(CAST(x AS DOUBLE) / mx * 127.0 + 0.5) AS BIGINT))""".stripMargin)
            .as("q_sum"),
          size(col("emb")).cast("long").as("dim"))
        .orderBy(col("vec_id"))
    },

    // ---- word-entropy quality signal ----
    // Shannon entropy of the word distribution per doc — low entropy flags
    // repetitive/template text (complements q63's repetition ratio).
    // H = log2(n) − (Σ c·ln c) / (n·ln 2) over per-word counts c. The
    // cross-word double sum runs in a FIXED order (array sorted by word)
    // on both engines, so associativity can't flip the rounded result.
    // Scale: one (doc, word) shuffle + one doc shuffle; the per-doc array
    // is vocabulary-bounded, never corpus-bounded.
    Q("q88_word_entropy",
      """WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |           FROM documents),
        |cnt AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
        |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    list_sum(list_transform(list(CAST(c AS DOUBLE) ORDER BY word),
        |      c -> c * ln(c))) AS s
        |  FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  round((ln(CAST(n_tokens AS DOUBLE)) - s / n_tokens) / ln(2.0), 6) AS entropy_bits
        |FROM tot
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val cnt = t(s, dir, "documents")
        .select(col("doc_id"), explode(wordsCol).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      cnt.groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          // collect (word, c) pairs, sort by word (unique per doc), then a
          // sequential left fold — same summation order as the oracle's
          // list(… ORDER BY word)
          expr("""aggregate(
                 |  transform(array_sort(collect_list(struct(word, CAST(c AS DOUBLE) AS cd))),
                 |    p -> p.cd * ln(p.cd)),
                 |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin).as("s"))
        .select(col("doc_id"), col("n_tokens"),
          round((log(col("n_tokens").cast("double")) - col("s") / col("n_tokens"))
            / log(lit(2.0)), 6).as("entropy_bits"))
        .orderBy(col("doc_id"))
    },

    // ---- corpus shape: token-length histogram ----
    // The length-distribution report every corpus card carries; also the
    // input for choosing packing/truncation lengths. Bucketing is integer
    // arithmetic (DIV) so both engines bin identically; the mean is an
    // exact integer sum divided once at the end (no accumulation-order
    // dependence). One |buckets|-row aggregate: scan-bound at any scale.
    Q("q89_token_histogram",
      """WITH w AS (SELECT doc_id, n_chars,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
        |  FROM documents)
        |SELECT least(CAST(n_tokens // 20 AS BIGINT), 9) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |  CAST(max(n_tokens) AS BIGINT) AS max_tokens,
        |  round(sum(n_chars) * 1.0 / count(*), 4) AS avg_chars
        |FROM w
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), size(wordsCol).as("n_tokens"))
        .groupBy(least(expr("n_tokens DIV 20"), lit(9)).cast("long").as("bucket"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          min(col("n_tokens")).cast("long").as("min_tokens"),
          max(col("n_tokens")).cast("long").as("max_tokens"),
          round(sum(col("n_chars")) * lit(1.0) / count(lit(1)), 4).as("avg_chars"))
        .orderBy(col("bucket"))
    },

    // ---- curriculum interleave: fair round-robin across sources ----
    // Deterministic training-order construction: round r of the output
    // takes the r-th doc of every source (per-source row_number), so no
    // source floods the head of the corpus. The window partitions by
    // source — parallel across sources, nothing global — and the final
    // ORDER BY + LIMIT is top-k (TakeOrderedAndProject), not a full sort.
    Q("q90_curriculum_interleave",
      """WITH r AS (SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS round
        |  FROM documents)
        |SELECT doc_id, source, round
        |FROM r
        |ORDER BY round, source, doc_id
        |LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          row_number().over(Window.partitionBy(col("source")).orderBy(col("doc_id")))
            .cast("long").as("round"))
        .orderBy(col("round"), col("source"), col("doc_id"))
        .limit(100)
    }
  )
}
