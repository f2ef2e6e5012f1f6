package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Text analysis for corpus curation: language-ID heuristic, quality
  * scoring, token counting, fingerprinting. All are single-pass, per-row
  * projections (no shuffle except the final presentation sort) — at 100 TB
  * these run map-side at scan speed inside whole-stage codegen.
  */
object TextAnalysis {

  private val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "los", "las", "y", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private val wordsCol: Column = split(lower(trim(col("text"))), "\\s+")

  private def duckList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  val qs: Seq[Q] = Seq(

    // ---- language identification (stopword-hit heuristic) ----
    // Score = distinct stopwords of each language present; prediction is
    // the max-scoring language, ties broken alphabetically.
    Q("q46_lang_id", {
      val scores = stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
        s"CAST(len(list_intersect(dwords, ${duckList(ws)})) AS BIGINT) AS s_$l"
      }.mkString(",\n    ")
      s"""WITH d AS (SELECT doc_id, lang,
         |    list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS dwords
         |  FROM documents),
         |scored AS (SELECT doc_id, lang,
         |    $scores
         |  FROM d)
         |SELECT doc_id, lang, s_de, s_en, s_es, s_fr,
         |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_fr THEN 'es'
         |       ELSE 'fr' END AS pred_lang
         |FROM scored
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), array_distinct(wordsCol).as("dwords"))
      val scored = stopwords.toSeq.sortBy(_._1).foldLeft(d) { case (df, (l, ws)) =>
        df.withColumn(s"s_$l",
          size(array_intersect(col("dwords"), array(ws.map(lit): _*))).cast("long"))
      }
      scored.select(col("doc_id"), col("lang"),
          col("s_de"), col("s_en"), col("s_es"), col("s_fr"),
          when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
            .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_fr"), "es")
            .otherwise("fr").as("pred_lang"))
        .orderBy(col("doc_id"))
    },

    // ---- quality scoring (length / punctuation / stopword ratios) ----
    Q("q47_quality_score",
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_words,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS BIGINT) AS stop_hits,
        |  round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
        |    / len(string_split_regex(lower(trim(text)), '\s+')), 4) AS avg_word_len,
        |  round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0
        |    / length(text), 6) AS punct_ratio,
        |  round(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x IN ('the', 'a', 'and', 'of', 'to'))) * 1.0
        |    / len(string_split_regex(lower(trim(text)), '\s+')), 6) AS stop_ratio
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val nWords = size(wordsCol)
      val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))
      val stopHits = size(filter(wordsCol,
        x => x.isin(stopwords("en"): _*)))
      t(s, dir, "documents").select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          nWords.cast("long").as("n_words"),
          nPunct.cast("long").as("n_punct"),
          stopHits.cast("long").as("stop_hits"),
          round(length(regexp_replace(col("text"), "\\s+", "")) * lit(1.0) / nWords, 4)
            .as("avg_word_len"),
          round(nPunct * lit(1.0) / length(col("text")), 6).as("punct_ratio"),
          round(stopHits * lit(1.0) / nWords, 6).as("stop_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---- token counting (whitespace + BPE-ish regex) ----
    Q("q48_token_count",
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
        |  round(length(text) * 1.0
        |    / len(string_split_regex(trim(text), '\s+')), 4) AS chars_per_token
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val wsTokens = size(split(trim(col("text")), "\\s+"))
      t(s, dir, "documents").select(
          col("doc_id"),
          wsTokens.cast("long").as("ws_tokens"),
          regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long")
            .as("bpe_tokens"),
          round(length(col("text")) * lit(1.0) / wsTokens, 4).as("chars_per_token"))
        .orderBy(col("doc_id"))
    },

    // ---- PII / URL scrubbing (masking pass) ----
    // The corpus has no live PII, so a deterministic synthetic email+URL is
    // appended per doc before scrubbing — the masking regexes then have
    // real work to do and the oracle checks the masked output exactly.
    Q("q62_pii_scrub",
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      substr(text, 1, 40) || ' contact: user' || doc_id
        |        || '@example.com via http://site.example/' || doc_id,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g') AS scrubbed,
        |  CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_nondigit
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val synthetic = concat(
        substring(col("text"), 1, 40),
        lit(" contact: user"), col("doc_id"),
        lit("@example.com via http://site.example/"), col("doc_id"))
      t(s, dir, "documents").select(
          col("doc_id"),
          regexp_replace(
            regexp_replace(synthetic,
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "https?://[^\\s]+", "<URL>").as("scrubbed"),
          length(regexp_replace(col("text"), "[0-9]", "")).cast("long").as("n_nondigit"))
        .orderBy(col("doc_id"))
    },

    // ---- repetition detection (within-doc n-gram repetition) ----
    // A high max-shingle count or low distinct/total ratio flags the
    // boilerplate/looping text that data curation drops. Uses raw (non-
    // distinct) shingles, unlike the dedup family.
    Q("q63_repetition",
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        |           FROM documents),
        |raw AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(words) - 1, 1)),
        |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
        |  FROM w),
        |cnt AS (SELECT doc_id, sh, count(*) AS c FROM raw GROUP BY doc_id, sh)
        |SELECT doc_id,
        |  max(c) AS max_rep,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(c) AS BIGINT) AS n_total,
        |  round(count(*) * 1.0 / sum(c), 6) AS uniq_ratio
        |FROM cnt
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "documents")
        .select(col("doc_id"), wordsCol.as("words"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(words) >= 3 THEN
            |  transform(sequence(0, size(words) - 3),
            |    i -> concat_ws(' ', words[i], words[i+1], words[i+2]))
            |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("sh"))
      raw.groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(
          max(col("c")).as("max_rep"),
          count(lit(1)).cast("long").as("n_distinct"),
          sum(col("c")).cast("long").as("n_total"),
          round(count(lit(1)) * lit(1.0) / sum(col("c")), 6).as("uniq_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---- corpus vocabulary: top-k tokens by frequency ----
    Q("q64_vocab_topk",
      """SELECT word, CAST(count(*) AS BIGINT) AS freq,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        |FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |      FROM documents)
        |GROUP BY word
        |ORDER BY freq DESC, word
        |LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(wordsCol).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).cast("long").as("freq"),
          countDistinct(col("doc_id")).cast("long").as("doc_freq"))
        .orderBy(col("freq").desc, col("word"))
        .limit(20)
    },

    // ---- TF-IDF weighting ----
    // Classic retrieval/curation weighting over the corpus: tf per
    // (doc, word), df per word, idf = ln(N/df). Emitted as the full
    // (doc, word) table — no ranking step, so the rounded score can't
    // reorder across engines on ulp differences in ln().
    Q("q66_tfidf",
      """WITH words AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |               FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.word,
        |  CAST(tf.tf AS BIGINT) AS tf,
        |  CAST(df.df AS BIGINT) AS df,
        |  round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
        |FROM tf JOIN df USING (word), n
        |WHERE tf.tf >= 3
        |ORDER BY doc_id, word""".stripMargin) { (s, dir) =>
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(wordsCol).as("word"))
      val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      tf.join(df, Seq("word"))
        .crossJoin(broadcast(nDocs))
        .filter(col("tf") >= 3)
        .select(col("doc_id"), col("word"),
          col("tf").cast("long").as("tf"),
          col("df").cast("long").as("df"),
          round(col("tf") * log(col("n_docs") * lit(1.0) / col("df")), 6).as("tfidf"))
        .orderBy(col("doc_id"), col("word"))
    },

    // ---- inverted index (posting lists) ----
    // word → document-frequency + the first postings, the building block
    // of term lookup over a corpus; posting lists stay bounded (top-5
    // doc_ids) so the operator output is index-shaped, not data-shaped.
    // Postings are emitted comma-joined as a scalar string: the driver's
    // checker cannot hash array-typed cells (same information, hashable).
    Q("q67_inverted_index",
      """SELECT word,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
        |  array_to_string(list_sort(list(DISTINCT doc_id))[1:5], ',') AS postings
        |FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |      FROM documents)
        |GROUP BY word
        |ORDER BY word""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(wordsCol).as("word"))
        .groupBy(col("word"))
        .agg(
          countDistinct(col("doc_id")).cast("long").as("doc_freq"),
          array_join(
            transform(slice(sort_array(collect_set(col("doc_id"))), 1, 5),
              _.cast("string")),
            ",").as("postings"))
        .orderBy(col("word"))
    },

    // ---- composite quality filter: the keep/drop decision ----
    // What a curation pipeline actually executes after scoring: rules are
    // evaluated in precedence order and the first failure names the drop
    // reason — length floor, shingle-repetition ceiling (q63's signal),
    // word-shape sanity (q47's avg word length). Pure map work over the
    // per-doc aggregates; the only shuffle is the doc-keyed repetition agg.
    Q("q74_quality_filter",
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        |           FROM documents),
        |raw AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(words) - 1, 1)),
        |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
        |  FROM w),
        |cnt AS (SELECT doc_id, sh, count(*) AS c FROM raw GROUP BY doc_id, sh),
        |rep AS (SELECT doc_id, count(*) * 1.0 / sum(c) AS uniq_ratio
        |  FROM cnt GROUP BY doc_id),
        |sig AS (SELECT d.doc_id,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_words,
        |    length(regexp_replace(text, '\s+', '', 'g')) * 1.0
        |      / len(string_split_regex(lower(trim(text)), '\s+')) AS awl,
        |    coalesce(r.uniq_ratio, 1.0) AS ur
        |  FROM documents d LEFT JOIN rep r ON d.doc_id = r.doc_id),
        |dec AS (SELECT doc_id, n_words, awl, ur,
        |    CASE WHEN n_words < 20 THEN 'too_short'
        |         WHEN ur < 0.4 THEN 'too_repetitive'
        |         WHEN awl > 12 OR awl < 2 THEN 'weird_words'
        |         ELSE 'keep' END AS verdict
        |  FROM sig)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(awl, 4) AS avg_word_len,
        |  round(ur, 6) AS uniq_ratio,
        |  verdict, (verdict = 'keep') AS keep
        |FROM dec
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val raw = t(s, dir, "documents")
        .select(col("doc_id"), wordsCol.as("words"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(words) >= 3 THEN
            |  transform(sequence(0, size(words) - 3),
            |    i -> concat_ws(' ', words[i], words[i+1], words[i+2]))
            |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("sh"))
      val rep = raw.groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg((count(lit(1)) * lit(1.0) / sum(col("c"))).as("uniq_ratio"))
      val nWords = size(wordsCol)
      val awl = length(regexp_replace(col("text"), "\\s+", "")) * lit(1.0) / nWords
      val sig = t(s, dir, "documents")
        .join(rep, Seq("doc_id"), "left")
        .select(col("doc_id"), nWords.as("n_words"), awl.as("awl"),
          coalesce(col("uniq_ratio"), lit(1.0)).as("ur"))
      val verdict = when(col("n_words") < 20, "too_short")
        .when(col("ur") < 0.4, "too_repetitive")
        .when(col("awl") > 12 || col("awl") < 2, "weird_words")
        .otherwise("keep")
      sig.withColumn("verdict", verdict)
        .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
          round(col("awl"), 4).as("avg_word_len"),
          round(col("ur"), 6).as("uniq_ratio"),
          col("verdict"), (col("verdict") === "keep").as("keep"))
        .orderBy(col("doc_id"))
    },

    // ---- domain-mixture weighting (data mixing for training) ----
    // Given target mixture proportions per source domain, compute each
    // domain's sampling weight (target share ÷ actual share) and the
    // expected post-sampling document count — the arithmetic behind
    // "mix 40% web, 30% books, …" corpus recipes. One tiny aggregation
    // (|domains| rows) + a broadcast of the one-row total: scan-bound at
    // any corpus size.
    Q("q80_mixture_weights", {
      // target mix: uniform across the observed source domains
      """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |tot AS (SELECT sum(n) AS total, count(*) AS n_src FROM cnt)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        |  round(n * 1.0 / total, 6) AS actual_share,
        |  round((1.0 / n_src) / (n * 1.0 / total), 6) AS weight,
        |  CAST(round(total * 1.0 / n_src, 0) AS BIGINT) AS target_docs
        |FROM cnt, tot
        |ORDER BY source""".stripMargin
    }) { (s, dir) =>
      val cnt = t(s, dir, "documents").groupBy(col("source")).agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).as("total"), count(lit(1)).as("n_src"))
      val share = col("n") * lit(1.0) / col("total")
      cnt.crossJoin(broadcast(tot))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          round(share, 6).as("actual_share"),
          round((lit(1.0) / col("n_src")) / share, 6).as("weight"),
          round(col("total") * lit(1.0) / col("n_src"), 0).cast("long").as("target_docs"))
        .orderBy(col("source"))
    },

    // ---- keyword search: TF-IDF-ranked retrieval ----
    // The consumer of the inverted index / TF-IDF machinery: score every
    // document for a fixed keyword query (tf × ln(N/df) per term, summed
    // in fixed order so both engines add the same doubles left-to-right)
    // and return the top matches. Corpus stats are two tiny aggregates
    // broadcast against the per-doc term frequencies — retrieval is one
    // scan-shaped pass at any corpus size.
    Q("q84_keyword_search",
      """WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |           FROM documents),
        |tf AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN word = 'data' THEN 1 ELSE 0 END) AS BIGINT) AS tf_data,
        |    CAST(sum(CASE WHEN word = 'scan' THEN 1 ELSE 0 END) AS BIGINT) AS tf_scan,
        |    CAST(sum(CASE WHEN word = 'hash' THEN 1 ELSE 0 END) AS BIGINT) AS tf_hash
        |  FROM w GROUP BY doc_id),
        |c AS (SELECT
        |    count(DISTINCT CASE WHEN word = 'data' THEN doc_id END) AS df_data,
        |    count(DISTINCT CASE WHEN word = 'scan' THEN doc_id END) AS df_scan,
        |    count(DISTINCT CASE WHEN word = 'hash' THEN doc_id END) AS df_hash
        |  FROM w),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, tf_data, tf_scan, tf_hash,
        |  round(tf_data * ln(n_docs * 1.0 / df_data)
        |      + tf_scan * ln(n_docs * 1.0 / df_scan)
        |      + tf_hash * ln(n_docs * 1.0 / df_hash), 6) AS score
        |FROM tf, c, n
        |WHERE tf_data + tf_scan + tf_hash > 0
        |ORDER BY score DESC, doc_id
        |LIMIT 15""".stripMargin) { (s, dir) =>
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(wordsCol).as("word"))
      def tfCol(term: String) =
        sum(when(col("word") === term, 1L).otherwise(0L)).as(s"tf_$term")
      def dfCol(term: String) =
        countDistinct(when(col("word") === term, col("doc_id"))).as(s"df_$term")
      val tf = words.groupBy(col("doc_id")).agg(tfCol("data"), tfCol("scan"), tfCol("hash"))
      val c = words.agg(dfCol("data"), dfCol("scan"), dfCol("hash"))
      val n = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      def idf(term: String) = log(col("n_docs") * lit(1.0) / col(s"df_$term"))
      tf.crossJoin(broadcast(c)).crossJoin(broadcast(n))
        .filter(col("tf_data") + col("tf_scan") + col("tf_hash") > 0)
        .select(col("doc_id"), col("tf_data"), col("tf_scan"), col("tf_hash"),
          round(col("tf_data") * idf("data")
            + col("tf_scan") * idf("scan")
            + col("tf_hash") * idf("hash"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(15)
    },

    // ---- document fingerprint (normalized-content hash) ----
    Q("q49_fingerprint",
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8) AS fp_prefix
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      t(s, dir, "documents").select(
          col("doc_id"),
          md5(norm).as("fp"),
          substring(md5(norm), 1, 8).as("fp_prefix"))
        .orderBy(col("doc_id"))
    },

    // ---- rule-based quality filter with per-rule reasons ----
    // The Gopher/C4-style hard-rule gate, with the property production
    // pipelines need and a bare boolean loses: WHICH rule rejected each
    // document (rule-hit telemetry is how thresholds get tuned). Four
    // rules on this corpus's signal axes: too_short (<30 words),
    // word_len (mean word length <4.2), no_stopword (no 'a'/'the'),
    // low_ttr (type-token ratio <0.5 — the repetition smell). The reason
    // string concatenates failed rules in one FIXED order on both
    // engines. Pure per-row projection: map-side at scan speed, no
    // shuffle before the presentation sort; the aggregate per-rule counts
    // downstream are one tiny groupBy.
    Q("q115_rule_filter",
      ruleFilterOracle) { (s, dir) =>
      ruleFlags(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_words"), col("keep"), col("reasons"))
        .orderBy(col("doc_id"))
    },

    // ---- count-min sketch: fixed-memory word-frequency estimation ----
    // The Cormode–Muthukrishnan sketch (J. Algorithms 2005): d=4 hash
    // rows × w=256 buckets; every word occurrence increments one cell per
    // row, a probe's estimate is the MIN over its d cells — always an
    // OVERESTIMATE (collisions only add), the property CountMinSpec
    // asserts over the whole vocabulary. This is the 100 TB shape for
    // frequency questions: the aggregate's key space is the FIXED d·w
    // cell grid, so map-side partial aggregation collapses every
    // partition to ≤1024 rows and the shuffle is constant-size no matter
    // the corpus — no full-vocabulary groupBy ever happens for the sketch
    // itself (the exact counts here exist only to oracle-check the
    // estimates against the top-20 truth). Hashing reuses the family's
    // Kirsch–Mitzenmacher derivation: ONE md5 per occurrence splits into
    // (h1, h2), row j probes bucket (h1 + j·h2) mod 256 — j ≤ 3 keeps
    // h1 + 3·h2 < 2^58, overflow-free in both engines.
    Q("q129_countmin", {
      val h1 = TextCommon.duckHex("m", 14)
      val h2 = TextCommon.duckHex("m", 14, from = 15)
      raw"""WITH wo AS MATERIALIZED (
           |  SELECT word, $h1 AS h1, $h2 AS h2 FROM (
           |    SELECT word, md5(word) AS m FROM (
           |      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
           |      FROM documents)
           |    WHERE regexp_matches(word, '^[a-z]{4,}$$'))),
           |sketch AS MATERIALIZED (
           |  SELECT j, (h1 + j * h2) % 256 AS bucket, count(*) AS cnt
           |  FROM wo, range(0, 4) t(j)
           |  GROUP BY 1, 2),
           |top20 AS MATERIALIZED (
           |  SELECT word, any_value(h1) AS h1, any_value(h2) AS h2,
           |    count(*) AS exact_cnt
           |  FROM wo GROUP BY word
           |  ORDER BY exact_cnt DESC, word LIMIT 20)
           |SELECT t.word, t.exact_cnt, min(s.cnt) AS cm_est
           |FROM top20 t CROSS JOIN range(0, 4) r(j) JOIN sketch s ON s.j = r.j
           |WHERE s.bucket = (t.h1 + r.j * t.h2) % 256
           |GROUP BY t.word, t.exact_cnt
           |ORDER BY exact_cnt DESC, word""".stripMargin
    }) { (s, dir) =>
      val wo = CacheRegistry.cache(s, s"q129-words:$dir") {
        // graft_md5_split: bit-exact with md5-hex + conv(substring) —
        // this is a per-word-OCCURRENCE pass (the count-min update
        // stream), the same full-corpus-scan cost class as q41's shingle
        // stage, so it gets the same string-free hash split (SCALE.md
        // round 13; the oracle recomputes the split from md5 hex text).
        graft.functions.GraftFunctions.register(s)
        t(s, dir, "documents")
          .select(explode(wordsCol).as("word"))
          .filter(col("word").rlike("^[a-z]{4,}$"))
          .select(col("word"), call_function("graft_md5_split", col("word")).as("hh"))
          .select(col("word"),
            col("hh").getItem(0).as("h1"),
            col("hh").getItem(1).as("h2"))
      }
      val sketch = countMinSketch(wo)
      val top20 = wo.groupBy(col("word"))
        .agg(first(col("h1")).as("h1"), first(col("h2")).as("h2"),
          count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("word"))
        .limit(20)
      countMinEstimate(top20, sketch)
        .select(col("word"), col("exact_cnt"), col("cm_est"))
        .orderBy(col("exact_cnt").desc, col("word"))
    },

    // ---- groupArrayIntersect parity ----
    // Per source: the tokens present in EVERY doc of that source — the
    // set-intersection aggregate, computed as "document frequency ==
    // group size" over distinct (source, doc, token) rows: an
    // intersection over millions of docs costs one distinct + one
    // count aggregate, never an array-by-array fold. Sources whose
    // intersection is empty still report (left join back onto the
    // source spine).
    Q("q234_group_array_intersect",
      raw"""WITH s AS (SELECT source, count(*) AS n_docs
           |  FROM documents GROUP BY source),
           |tk AS (SELECT DISTINCT source, doc_id,
           |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
           |  FROM documents),
           |df AS (SELECT source, tok, count(*) AS df
           |  FROM tk GROUP BY source, tok),
           |c AS (SELECT df.source, CAST(count(*) AS BIGINT) AS n_common,
           |    string_agg(tok, ',' ORDER BY tok) AS common_toks
           |  FROM df JOIN s USING (source) WHERE df = n_docs
           |  GROUP BY df.source)
           |SELECT s.source, n_docs,
           |  coalesce(n_common, 0) AS n_common,
           |  coalesce(common_toks, '') AS common_toks
           |FROM s LEFT JOIN c USING (source)
           |ORDER BY s.source""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val spine = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val tk = docs
        .select(col("source"), col("doc_id"), explode(wordsCol).as("tok"))
        .distinct()
      val c = tk.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("df"))
        .join(spine, Seq("source"))
        .filter(col("df") === col("n_docs"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_common"),
          concat_ws(",", sort_array(collect_list(col("tok")))).as("common_toks"))
      spine.join(c, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          coalesce(col("common_toks"), lit("")).as("common_toks"))
        .orderBy(col("source"))
    },

    // ---- diacritics folding (accent-insensitive matching) ----
    // The other normalization multilingual dedup/search needs: fold
    // 'crème' → 'creme' so accent variants hash/join together. Both
    // engines accent a deterministic sample of the text's vowels (the
    // translate below), then strip with INDEPENDENT implementations —
    // Spark decomposes with java.text.Normalizer NFD and drops the
    // combining marks (the textbook fold); DuckDB uses its native
    // strip_accents — and the md5 of the folded text must agree
    // byte-for-byte. The chosen accents (é à ç ü ñ ö) all decompose to
    // base + combining mark, where the two definitions provably
    // coincide. Like q92's composition direction, the fold is a native
    // codegen'd expression (`functions/FoldAccents`, with an all-ASCII
    // zero-alloc fast path — the overwhelming case at 100 TB), not a
    // per-row closure.
    Q("q289_strip_accents",
      """WITH d AS (SELECT doc_id,
        |    translate(text, 'eacuno', 'éàçüñö') AS accented
        |  FROM documents),
        |f AS (SELECT doc_id, accented,
        |    strip_accents(accented) AS folded
        |  FROM d)
        |SELECT doc_id,
        |  (accented <> folded) AS changed,
        |  md5(folded) AS folded_md5
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      import graft.functions.GraftFunctions.fold_accents
      t(s, dir, "documents")
        .select(col("doc_id"),
          translate(col("text"), "eacuno", "éàçüñö").as("accented"))
        .select(col("doc_id"),
          (col("accented") =!= fold_accents(col("accented"))).as("changed"),
          md5(fold_accents(col("accented")).cast("binary")).as("folded_md5"))
        .orderBy(col("doc_id"))
    }
  )

  /** The d=4 × w=256 count-min cell grid over a (h1, h2) occurrence
    * frame: explode the d rows, count per (row, bucket) — a fixed-key
    * aggregate whose shuffle is ≤ d·w rows per partition regardless of
    * corpus size. */
  def countMinSketch(occurrences: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    occurrences
      .select(explode(array((0 until 4).map(lit): _*)).as("j"),
        col("h1"), col("h2"))
      .select(col("j"), ((col("h1") + col("j") * col("h2")) % 256).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-query the sketch for each probe word (carrying h1/h2): the
    * estimate is min over the d per-row cells — a broadcast-size join
    * when the probe set is small. */
  def countMinEstimate(probes: org.apache.spark.sql.DataFrame,
      sketch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    probes
      .select(col("word"), col("exact_cnt"), col("h1"), col("h2"),
        explode(array((0 until 4).map(lit): _*)).as("j"))
      .select(col("word"), col("exact_cnt"), col("j"),
        ((col("h1") + col("j") * col("h2")) % 256).as("bucket"))
      .join(sketch, Seq("j", "bucket"))
      .groupBy(col("word"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cm_est"))

  /** Per-document rule gate, appended as columns (`n_words`, `keep`,
    * `reasons`) to whatever the input carries — single map-side pass, no
    * shuffle, so it drops into a per-micro-batch foreachBatch body exactly
    * like the batch query (see StreamingChainSpec). */
  def ruleFlags(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val flagged = docs
      // NULL text coalesces to an empty word list so n_words=0 and
      // too_short FIRES — otherwise every when() evaluates to NULL and
      // keep=0 would carry an empty reasons string, silently breaking the
      // "keep=1 iff no rule fired" contract on a corpus with missing text
      .withColumn("__ws", coalesce(wordsCol, array().cast("array<string>")))
      .withColumn("n_words", size(col("__ws")).cast("long"))
      // nullif guards the n_words=0 (coalesced-null) row: ANSI mode makes
      // 0/0 an error, and a NULL ratio correctly skips the ratio rules
      .withColumn("__avg_wlen",
        expr("aggregate(transform(__ws, x -> length(x)), 0L, (acc, v) -> acc + v)")
          .cast("double") / nullif(size(col("__ws")), lit(0)))
      .withColumn("__n_stop", size(expr("filter(__ws, x -> x IN ('a', 'the'))")))
      .withColumn("__ttr",
        size(array_distinct(col("__ws"))).cast("double") /
          nullif(size(col("__ws")), lit(0)))
    flagged
      .withColumn("keep",
        when(col("n_words") >= 30 && col("__avg_wlen") >= 4.2
          && col("__n_stop") > 0 && col("__ttr") >= 0.5, 1L).otherwise(0L))
      .withColumn("reasons", concat_ws(",",
        when(col("n_words") < 30, "too_short"),
        when(col("__avg_wlen") < 4.2, "word_len"),
        when(col("__n_stop") === 0, "no_stopword"),
        when(col("__ttr") < 0.5, "low_ttr")))
      .drop("__ws", "__avg_wlen", "__n_stop", "__ttr")
  }

  private def ruleFilterOracle: String =
      """WITH w AS (SELECT doc_id,
        |    CASE WHEN text IS NULL THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS ws
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
        |      / nullif(len(ws), 0) AS avg_wlen,
        |    len(list_filter(ws, x -> x IN ('a', 'the'))) AS n_stop,
        |    CAST(len(list_distinct(ws)) AS DOUBLE) / nullif(len(ws), 0) AS ttr
        |  FROM w)
        |SELECT doc_id, n_words,
        |  CAST(CASE WHEN n_words >= 30 AND avg_wlen >= 4.2
        |            AND n_stop > 0 AND ttr >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS keep,
        |  concat_ws(',',
        |    CASE WHEN n_words < 30 THEN 'too_short' END,
        |    CASE WHEN avg_wlen < 4.2 THEN 'word_len' END,
        |    CASE WHEN n_stop = 0 THEN 'no_stopword' END,
        |    CASE WHEN ttr < 0.5 THEN 'low_ttr' END) AS reasons
        |FROM m
        |ORDER BY doc_id""".stripMargin
}
