package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.ops.Loops._
import graft.schema.Tables.{t, tSpread}

/** Substring- and token-level curation operators: duplicated n-gram span
  * detection (the substring-granularity complement of q40's document-level
  * exact dedup), BPE pair statistics plus a distributed BPE merge trainer,
  * and shingle-set containment (near-superset / quotation detection, the
  * directional complement of q42's symmetric Jaccard).
  *
  * Scale design (100 TB corpus):
  *  - q108 groups on the n-gram's md5, a fixed-width key, never the raw
  *    span text: the shuffle carries 32 hex chars + counts per gram and the
  *    example span rides along as a min() aggregate. At cluster scale the
  *    hex would shrink to the 16-byte binary digest — same plan shape.
  *  - q109's pair counting is one explode + one groupBy over two-char
  *    keys (alphabet², a tiny key space → map-side partial aggregation
  *    collapses almost everything before the shuffle).
  *  - q112 reuses the dedup family's persisted 8-byte shingle-hash frame
  *    ([[TextDedup.shingleRows]]) and its equi-join candidate generation;
  *    the only new math is the least-size denominator, so the cost profile
  *    is exactly q42's (and the doc-frequency cap applies through the same
  *    conf knob when enabled upstream).
  */
object SubstringOps {

  /** n-gram width for duplicated-span detection: 8 words ≈ the shortest
    * span that is overwhelmingly memorization rather than idiom (the
    * published substring-dedup pipelines use 50 BPE tokens; 8 words is the
    * same idea scaled to this corpus's ~100-word documents). */
  private val GramWords = 8

  private val wordsCol: Column = TextCommon.wordsCol

  /** Per-word adjacent character pairs, positions 1..len-1 (Spark side). */
  private val charPairsExpr: Column = expr(
    """CASE WHEN length(word) >= 2 THEN
      |  transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))
      |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)

  /** One BPE merge sweep over symbol arrays: non-overlapping left-to-right
    * replacement of adjacent (a, b) with the merged symbol — the exact
    * greedy semantics of the classic BPE trainer, as a single codegen-able
    * array fold (no UDF). Matching on full symbol strings keeps merged
    * symbols distinct from raw ones ("a"+"ab" never aliases "aa"+"b" as
    * symbol SEQUENCES even when their renderings collide). */
  private[ops] def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Distributed BPE merge training: `numMerges` rounds of (count adjacent
    * symbol pairs weighted by word frequency) → (take the most frequent
    * pair) → (merge it everywhere). Input: a (word, cnt) frequency table —
    * the standard pre-aggregation that makes BPE training corpus-size-
    * independent (the iteration cost scales with |vocabulary|, not
    * |corpus|, which is what makes the loop viable at 100 TB: one narrow
    * groupBy builds the word table, then every merge round touches only
    * distinct words). Each round is one aggregate + a ONE-ROW driver
    * collect (the argmax pair — same bounded-collect discipline as Skew's
    * offset tables); the symbol column is rewritten via [[mergeOnce]] and
    * localCheckpointed every few rounds so the plan cannot grow linearly
    * with merges. Returns the learned merges in order plus the final
    * symbolized vocabulary. */
  def bpeTrain(words: DataFrame, numMerges: Int)
      : (Seq[(String, String)], DataFrame) = {
    var vocab = words.select(
      col("word"), col("cnt"), split(col("word"), "").as("syms"))
    val ps = Loops.scope(words.sparkSession) // vocab chain: pin k supersedes k−1
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = vocab
        .select(col("cnt"), explode(expr(
          """CASE WHEN size(syms) >= 2 THEN
            |  transform(sequence(1, size(syms) - 1),
            |    i -> struct(syms[i - 1] AS a, syms[i] AS b))
            |ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"""
            .stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        vocab = vocab.withColumn("syms", mergeOnce(col("syms"), a, b))
        round += 1
        // truncate lineage every few rewrites: each merge nests another
        // fold into the plan, and an unbounded expression tree is a driver
        // cost even before execution (same discipline as clusterPairs)
        if (round % 4 == 0) vocab = vocab.pin(ps, false)
      }
    }
    (merges.result(), vocab)
  }

  /** One row per 8-word span occurrence WITH its 1-based start word index:
    * (doc_id, pos, gram). Map-side explode at scan speed. The position
    * rides along from the same `sequence(…)` enumeration that generates
    * the gram — q108 drops it, q141's span coalescing is built on it. */
  private[ops] def gramRowsPos(s: SparkSession, dir: String) =
    gramRowsPosFrom(tSpread(s, dir, "documents"))

  /** [[gramRowsPos]] over any (doc_id, text, …) frame — the per-batch
    * map-side landing step of the streaming composition
    * (StreamingSpanDedupSpec) shares it with the batch queries. */
  private[graft] def gramRowsPosFrom(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), wordsCol.as("w"))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(w) >= $GramWords THEN
           |  transform(sequence(1, size(w) - ${GramWords - 1}),
           |    i -> struct(CAST(i AS BIGINT) AS pos,
           |                array_join(slice(w, i, $GramWords), ' ') AS gram))
           |ELSE CAST(array() AS ARRAY<STRUCT<pos: BIGINT, gram: STRING>>) END"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))

  /** One row per 8-word span occurrence: (doc_id, gram). */
  private[ops] def gramRows(s: SparkSession, dir: String) =
    gramRowsPos(s, dir).select(col("doc_id"), col("gram"))

  /** Shared (doc_id, pos, gm = md5(gram)) frame, registry-cached once per
    * (session, dir) — the q41-shingle-cache pattern applied to the 8-gram
    * family (OPTIMIZATION_r16). q108's group pass, q141's intervals and
    * q151's removal each re-ran the documents scan + gram explode + md5;
    * the hashed-positions frame is the exact input all three share (only
    * q108's bounded example pass still needs gram TEXT, and re-derives it
    * at scan speed for 25 literal hashes). */
  private[ops] def gramMd5Pos(s: SparkSession, dir: String): DataFrame =
    CacheRegistry.cache(s, s"q108-grampos:$dir") {
      gramRowsPos(s, dir)
        .select(col("doc_id"), col("pos"), md5(col("gram")).as("gm"))
    }

  /** The scalable core of q108: every 8-word span occurring in ≥2 distinct
    * documents, counts only — the shuffle carries nothing but the 32-byte
    * md5 and two partial counts (never the span text). ScaleBench measures
    * this frame's growth; q108 decorates its top 25 with example text. */
  def dupSpanGroups(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    gramMd5Pos(s, dir)
      .groupBy(col("gm").as("gram_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)

  /** The second half of substring dedup: coalesce each document's
    * duplicated 8-gram occurrences (overlapping OR touching start
    * positions) into MAXIMAL repeated spans — the per-doc removal
    * intervals a production pipeline cuts out. q108 detects which grams
    * repeat across documents; this turns the detection into actionable
    * intervals: the union of a doc's duplicated gram windows [pos,
    * pos+7], merged while the next start is ≤ previous start + 8.
    *
    * Plan shape at 100 TB: the dup-gram set is the q108 groupBy on the
    * fixed-width md5 key (shuffle carries 32 hex chars + a count);
    * flagging occurrences is an equi-join on that same md5 (key
    * cardinality grows with the corpus — no hot key); coalescing is a
    * gaps-and-islands window partitioned BY DOC (narrow per-doc state,
    * high-cardinality partition key, no skew); the final interval groupBy
    * is per (doc, island). No driver collect anywhere. Output: (doc_id,
    * span_start, span_end, span_words, n_grams), word positions 1-based
    * inclusive. */
  def dupSpanIntervals(s: SparkSession, dir: String): DataFrame =
    dupSpanIntervalsFrom(gramMd5Pos(s, dir))

  /** [[dupSpanIntervals]] over an accumulated (doc_id, pos, gm) gram
    * store, optionally restricted to `onlyDocs` (doc_id) — the dup-gram
    * statistic always runs over the FULL store (a gram's duplicated-ness
    * is a corpus property), the interval rebuild over the restriction.
    * The streaming composition leans on this split: span intervals are
    * NOT monotone under arrivals (a new doc can flip a gram from unique
    * to duplicated, extending or merging islands inside OLD documents),
    * so the incremental rule is recompute-the-affected, not union — and
    * the affected set is exactly the holders of newly-duplicated grams
    * plus the arrivals themselves (proven in StreamingSpanDedupSpec). */
  private[graft] def dupSpanIntervalsFrom(g: DataFrame,
      onlyDocs: Option[DataFrame] = None): DataFrame = {
    // grams repeated across ≥2 docs — same statistic as dupSpanGroups,
    // keyed on the md5 so the shuffle never carries span text
    val dups = g.groupBy(col("gm"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gm"))
    val scope = onlyDocs.fold(g)(d => g.join(d, Seq("doc_id"), "left_semi"))
    val flagged = scope.join(dups, Seq("gm")).select(col("doc_id"), col("pos"))
    coalesceSpans(flagged)
  }

  /** Gaps-and-islands interval merge over a (doc_id, pos) frame of
    * duplicated gram start positions: all intervals have width GramWords,
    * and positions are sorted per doc, so [prev, prev+7] and [pos, pos+7]
    * overlap or touch iff pos - prev <= GramWords; a larger gap starts a
    * new island. Separated from [[dupSpanIntervals]] so the merge
    * semantics are unit-testable on synthetic positions. */
  private[ops] def coalesceSpans(flagged: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    val brk = when(col("pos") - prev <= GramWords, 0).otherwise(1)
    flagged
      .withColumn("brk", brk)
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(GramWords - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_words"),
        col("n_grams"))
  }

  /** Apply removal intervals to their documents: drop every word whose
    * 1-based position lies inside one of the doc's spans and report the
    * residual. `docs` is (doc_id, w: ARRAY<STRING>) — the SAME tokenization
    * the intervals were computed over; `intervals` is [[dupSpanIntervals]]'
    * shape (doc_id, span_start, span_end, span_words, …). Intervals are
    * maximal ⇒ disjoint ⇒ their width sum IS the removed-word count. Docs
    * without intervals are excluded (nothing to rewrite). The word filter
    * runs at scan speed via higher-order functions against the doc's OWN
    * (tiny) interval list — no per-word explode, no window, one doc_id
    * equi-join. Unit-tested on synthetic intervals in SubstringOpsSpec;
    * q151 strict-checks the full derivation. */
  private[graft] def applySpanRemoval(docs: DataFrame,
      intervals: DataFrame): DataFrame = {
    val ivs = intervals
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("ivs"),
        sum(col("span_end") - col("span_start") + 1).as("removed_words"))
    docs
      .join(ivs, Seq("doc_id"))
      .withColumn("kept", expr(
        """filter(transform(w, (x, j) -> struct(CAST(j + 1 AS BIGINT) AS p, x AS wd)),
          |  s -> !exists(ivs, v -> s.p >= v.span_start AND s.p <= v.span_end))"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        col("removed_words"),
        size(col("kept")).cast("long").as("kept_words"),
        md5(expr("array_join(transform(kept, s -> s.wd), ' ')")).as("residual_md5"))
  }

  val qs: Seq[Q] = Seq(

    // ---- duplicated n-gram spans: substring-level exact dedup ----
    // Document-level dedup (q40) misses the 100 TB reality that corpora
    // repeat SPANS — boilerplate, licenses, quoted passages — inside
    // otherwise-unique documents. This surfaces every 8-word span occurring
    // in ≥2 distinct documents, ranked by spread. Group key = md5 of the
    // span (fixed width), and the group shuffle carries ONLY (md5, counts):
    // since most grams are unique, a min(example) aggregate in the same
    // pass would drag nearly every span's full text through the shuffle
    // (~2× the bytes). Instead the top 25 groups are COLLECTED to the
    // driver (bounded by LIMIT 25), so the expensive group pass runs
    // exactly once, and the example text comes from a second scan-speed
    // pass filtered against the 25 literal hashes — at 100 TB a second
    // parquet scan is cheap, shuffle bytes are the bottleneck.
    Q("q108_dup_ngram_spans",
      raw"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
           |           FROM documents),
           |g AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(words) - ${GramWords - 2}, 1)),
           |    i -> array_to_string(list_slice(words, i, i + ${GramWords - 1}), ' '))) AS gram
           |  FROM w)
           |SELECT md5(gram) AS gram_md5, min(gram) AS example,
           |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
           |FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
           |ORDER BY n_docs DESC, n_occ DESC, gram_md5
           |LIMIT 25""".stripMargin) { (s, dir) =>
      import s.implicits._
      val topRows = dupSpanGroups(s, dir)
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram_md5"))
        .limit(25)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val top = topRows.toDF("gram_md5", "n_docs", "n_occ")
      val md5s = topRows.map(_._1)
      val examples = gramRows(s, dir)
        .filter(md5(col("gram")).isin(md5s: _*))
        .groupBy(md5(col("gram")).as("gram_md5"))
        .agg(min(col("gram")).as("example"))
      examples.join(broadcast(top), Seq("gram_md5"))
        .select(col("gram_md5"), col("example"), col("n_docs"), col("n_occ"))
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram_md5"))
    },

    // ---- BPE pair statistics: the counting step of tokenizer training ----
    // Adjacent character-pair frequencies over the whitespace vocabulary —
    // the argmax of this table IS the first BPE merge; [[bpeTrain]] runs
    // the full iterated version (spec-verified), this query oracle-checks
    // the distributed counting core. Two-char keys ⇒ the groupBy's key
    // space is tiny and map-side partial agg collapses the shuffle to
    // |alphabet|² rows per partition.
    Q("q109_bpe_pairs",
      raw"""WITH wd AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
           |            FROM documents),
           |p AS (SELECT unnest(list_transform(range(1, greatest(len(word), 1)),
           |    i -> substr(word, i, 2))) AS pair
           |  FROM wd WHERE len(word) >= 2)
           |SELECT pair, count(*) AS n
           |FROM p GROUP BY pair
           |ORDER BY n DESC, pair
           |LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(wordsCol).as("word"))
        .select(explode(charPairsExpr).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },

    // ---- iterated BPE training: 2 oracle-checked merge rounds ----
    // q109 oracle-checks the distributed pair-counting core; this checks
    // the TRAINER — [[bpeTrain]] run end-to-end for 2 merges over a tiny
    // deterministic vocabulary (top-20 ≥4-char [a-z] words by corpus
    // frequency), so the argmax choice, the greedy non-overlapping
    // [[mergeOnce]] fold, and the merge ORDER (round 2 counts pairs over
    // round 1's rewritten symbols) are all value-checked against DuckDB.
    // The oracle applies each data-derived merge with a list_reduce string-
    // accumulator fold — semantics proven identical to mergeOnce's
    // left-to-right greedy replacement ('|' delimiters are safe because
    // the vocabulary is filtered to ^[a-z]{4,}$ on both engines). Scale:
    // the trainer's cost is ∝ |vocabulary| per round (the standard word-
    // frequency pre-aggregation), with one-row argmax collects — corpus
    // size only enters through the initial word count.
    Q("q121_bpe_train2",
      raw"""WITH wd AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
           |            FROM documents),
           |vocab0 AS (SELECT word, count(*) AS cnt FROM wd
           |  WHERE regexp_matches(word, '^[a-z]{4,}$$')
           |  GROUP BY word ORDER BY cnt DESC, word LIMIT 20),
           |sy0 AS (SELECT word, cnt,
           |    list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS syms
           |  FROM vocab0),
           |p1 AS (SELECT s['a'] AS a, s['b'] AS b, sum(cnt) AS n FROM (
           |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
           |      i -> {'a': syms[i], 'b': syms[i+1]})) AS s
           |    FROM sy0 WHERE len(syms) >= 2)
           |  GROUP BY 1, 2),
           |m1 AS (SELECT a, b FROM p1 ORDER BY n DESC, a, b LIMIT 1),
           |sy1 AS (SELECT word, cnt, string_split(substr(list_reduce(list_prepend('', syms),
           |    (acc, x) -> CASE WHEN x = m1.b AND ends_with(acc, '|' || m1.a)
           |      THEN regexp_replace(acc, '\|[^|]*$$', '') || '|' || m1.a || m1.b
           |      ELSE acc || '|' || x END), 2), '|') AS syms
           |  FROM sy0, m1),
           |p2 AS (SELECT s['a'] AS a, s['b'] AS b, sum(cnt) AS n FROM (
           |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
           |      i -> {'a': syms[i], 'b': syms[i+1]})) AS s
           |    FROM sy1 WHERE len(syms) >= 2)
           |  GROUP BY 1, 2),
           |m2 AS (SELECT a, b FROM p2 ORDER BY n DESC, a, b LIMIT 1),
           |sy2 AS (SELECT word, cnt, string_split(substr(list_reduce(list_prepend('', syms),
           |    (acc, x) -> CASE WHEN x = m2.b AND ends_with(acc, '|' || m2.a)
           |      THEN regexp_replace(acc, '\|[^|]*$$', '') || '|' || m2.a || m2.b
           |      ELSE acc || '|' || x END), 2), '|') AS syms
           |  FROM sy1, m2)
           |SELECT word, cnt, array_to_string(syms, ' ') AS syms
           |FROM sy2 ORDER BY word""".stripMargin) { (s, dir) =>
      // localCheckpoint: 3 downstream actions (2 argmax collects + the
      // result) must not each re-run the corpus-wide word aggregate
      val words = t(s, dir, "documents")
        .select(explode(wordsCol).as("word"))
        .filter(col("word").rlike("^[a-z]{4,}$"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
        .pin()
      val (_, vocab) = bpeTrain(words, numMerges = 2)
      vocab.select(col("word"), col("cnt"), array_join(col("syms"), " ").as("syms"))
        .orderBy(col("word"))
    },

    // ---- BPE application: tokenize the WHOLE corpus with learned merges --
    // The other half of the tokenizer story: q121 trains on the bounded
    // top-20 vocabulary; this APPLIES the learned merge list to every
    // qualifying word in the corpus (the production tokenization pass) and
    // reports the resulting symbol frequencies. Scale shape: training cost
    // is vocabulary-bounded (q121), application is a pure map over the
    // DISTINCT-word table with the merges folded in as literals — the
    // distinct-word aggregation is the only corpus-sized shuffle, the
    // mergeOnce folds run at scan speed, and symbol counting is a tiny-key
    // groupBy (map-side partial agg collapses it). The oracle reruns the
    // identical derivation: train CTEs from q121, then the same two
    // list_reduce folds over the full word table.
    Q("q124_bpe_apply",
      raw"""WITH wd AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
           |            FROM documents),
           |vocab0 AS (SELECT word, count(*) AS cnt FROM wd
           |  WHERE regexp_matches(word, '^[a-z]{4,}$$')
           |  GROUP BY word ORDER BY cnt DESC, word LIMIT 20),
           |sy0 AS (SELECT word, cnt,
           |    list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS syms
           |  FROM vocab0),
           |p1 AS (SELECT s['a'] AS a, s['b'] AS b, sum(cnt) AS n FROM (
           |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
           |      i -> {'a': syms[i], 'b': syms[i+1]})) AS s
           |    FROM sy0 WHERE len(syms) >= 2)
           |  GROUP BY 1, 2),
           |m1 AS (SELECT a, b FROM p1 ORDER BY n DESC, a, b LIMIT 1),
           |sy1 AS (SELECT word, cnt, string_split(substr(list_reduce(list_prepend('', syms),
           |    (acc, x) -> CASE WHEN x = m1.b AND ends_with(acc, '|' || m1.a)
           |      THEN regexp_replace(acc, '\|[^|]*$$', '') || '|' || m1.a || m1.b
           |      ELSE acc || '|' || x END), 2), '|') AS syms
           |  FROM sy0, m1),
           |p2 AS (SELECT s['a'] AS a, s['b'] AS b, sum(cnt) AS n FROM (
           |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
           |      i -> {'a': syms[i], 'b': syms[i+1]})) AS s
           |    FROM sy1 WHERE len(syms) >= 2)
           |  GROUP BY 1, 2),
           |m2 AS (SELECT a, b FROM p2 ORDER BY n DESC, a, b LIMIT 1),
           |allw AS (SELECT word, count(*) AS cnt FROM wd
           |  WHERE regexp_matches(word, '^[a-z]{4,}$$')
           |  GROUP BY word),
           |ay0 AS (SELECT word, cnt,
           |    list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS syms
           |  FROM allw),
           |ay1 AS (SELECT word, cnt, string_split(substr(list_reduce(list_prepend('', syms),
           |    (acc, x) -> CASE WHEN x = m1.b AND ends_with(acc, '|' || m1.a)
           |      THEN regexp_replace(acc, '\|[^|]*$$', '') || '|' || m1.a || m1.b
           |      ELSE acc || '|' || x END), 2), '|') AS syms
           |  FROM ay0, m1),
           |ay2 AS (SELECT word, cnt, string_split(substr(list_reduce(list_prepend('', syms),
           |    (acc, x) -> CASE WHEN x = m2.b AND ends_with(acc, '|' || m2.a)
           |      THEN regexp_replace(acc, '\|[^|]*$$', '') || '|' || m2.a || m2.b
           |      ELSE acc || '|' || x END), 2), '|') AS syms
           |  FROM ay1, m2)
           |SELECT s AS symbol, CAST(sum(cnt) AS BIGINT) AS n
           |FROM (SELECT cnt, unnest(syms) AS s FROM ay2)
           |GROUP BY s
           |ORDER BY n DESC, symbol
           |LIMIT 20""".stripMargin) { (s, dir) =>
      val qualifying = t(s, dir, "documents")
        .select(explode(wordsCol).as("word"))
        .filter(col("word").rlike("^[a-z]{4,}$"))
      // distinct-word table: apply the merge folds once per unique word,
      // weight symbol counts by the word's corpus frequency
      val allWords = qualifying
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .pin()
      val top20 = allWords
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
      val (merges, _) = bpeTrain(top20, numMerges = 2)
      val tokenized = merges.foldLeft(
          allWords.select(col("word"), col("cnt"), split(col("word"), "").as("syms"))) {
        case (df, (a, b)) => df.withColumn("syms", mergeOnce(col("syms"), a, b))
      }
      tokenized
        .select(col("cnt"), explode(col("syms")).as("symbol"))
        .groupBy(col("symbol"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("symbol"))
        .limit(20)
    },

    // ---- tokenizer fertility / compression audit per language ----
    // The multilingual tokenizer-quality report (fertility = tokens per
    // word, the standard metric for how badly a vocabulary serves a
    // language; chars-per-token = the compression the context window
    // actually gets; bypass share = word occurrences that skip BPE via
    // the qualifying regex — the byte-fallback fraction). Merges are
    // q124's global 2-merge table; the application fold runs once per
    // distinct (lang, word) and every metric is integer arithmetic over
    // (cnt, |syms|, len) — strict in both engines. Scale shape: training
    // is vocabulary-bounded (q121's argument), the fold runs at scan
    // speed over the distinct-word table, and the output is |langs|
    // rows — the audit a tokenizer team reruns per vocab candidate.
    Q("q330_tokenizer_fertility",
      raw"""WITH wd AS (SELECT lang,
           |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
           |  FROM documents),
           |gw AS (SELECT word, count(*) AS cnt FROM wd
           |  WHERE regexp_matches(word, '^[a-z]{4,}$$')
           |  GROUP BY word),
           |vocab0 AS (SELECT word, cnt FROM gw
           |  ORDER BY cnt DESC, word LIMIT 20),
           |sy0 AS (SELECT word, cnt,
           |    list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS syms
           |  FROM vocab0),
           |p1 AS (SELECT s['a'] AS a, s['b'] AS b, sum(cnt) AS n FROM (
           |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
           |      i -> {'a': syms[i], 'b': syms[i+1]})) AS s
           |    FROM sy0 WHERE len(syms) >= 2)
           |  GROUP BY 1, 2),
           |m1 AS (SELECT a, b FROM p1 ORDER BY n DESC, a, b LIMIT 1),
           |sy1 AS (SELECT word, cnt, string_split(substr(list_reduce(list_prepend('', syms),
           |    (acc, x) -> CASE WHEN x = m1.b AND ends_with(acc, '|' || m1.a)
           |      THEN regexp_replace(acc, '\|[^|]*$$', '') || '|' || m1.a || m1.b
           |      ELSE acc || '|' || x END), 2), '|') AS syms
           |  FROM sy0, m1),
           |p2 AS (SELECT s['a'] AS a, s['b'] AS b, sum(cnt) AS n FROM (
           |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
           |      i -> {'a': syms[i], 'b': syms[i+1]})) AS s
           |    FROM sy1 WHERE len(syms) >= 2)
           |  GROUP BY 1, 2),
           |m2 AS (SELECT a, b FROM p2 ORDER BY n DESC, a, b LIMIT 1),
           |lw AS (SELECT lang, word, count(*) AS cnt FROM wd
           |  WHERE regexp_matches(word, '^[a-z]{4,}$$')
           |  GROUP BY 1, 2),
           |ly0 AS (SELECT lang, word, cnt,
           |    list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS syms
           |  FROM lw),
           |ly1 AS (SELECT lang, word, cnt, string_split(substr(list_reduce(list_prepend('', syms),
           |    (acc, x) -> CASE WHEN x = m1.b AND ends_with(acc, '|' || m1.a)
           |      THEN regexp_replace(acc, '\|[^|]*$$', '') || '|' || m1.a || m1.b
           |      ELSE acc || '|' || x END), 2), '|') AS syms
           |  FROM ly0, m1),
           |ly2 AS (SELECT lang, word, cnt, string_split(substr(list_reduce(list_prepend('', syms),
           |    (acc, x) -> CASE WHEN x = m2.b AND ends_with(acc, '|' || m2.a)
           |      THEN regexp_replace(acc, '\|[^|]*$$', '') || '|' || m2.a || m2.b
           |      ELSE acc || '|' || x END), 2), '|') AS syms
           |  FROM ly1, m2),
           |agg AS (SELECT lang, sum(cnt) AS occ,
           |    sum(cnt * len(syms)) AS toks, sum(cnt * len(word)) AS chars
           |  FROM ly2 GROUP BY lang),
           |tot AS (SELECT lang, count(*) AS n_all FROM wd GROUP BY lang)
           |SELECT a.lang, CAST(occ AS BIGINT) AS n_occ,
           |  round(toks * 1.0 / occ, 6) AS fertility,
           |  round(chars * 1.0 / toks, 6) AS chars_per_token,
           |  round((t.n_all - occ) * 1.0 / t.n_all, 6) AS bypass_share
           |FROM agg a JOIN tot t USING (lang)
           |ORDER BY lang""".stripMargin) { (s, dir) =>
      val wd = t(s, dir, "documents")
        .select(col("lang"), explode(wordsCol).as("word"))
      val qualifying = wd.filter(col("word").rlike("^[a-z]{4,}$"))
      val globalWords = qualifying
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .pin()
      val top20 = globalWords
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
      val (merges, _) = bpeTrain(top20, numMerges = 2)
      val langWords = qualifying
        .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
      val tokenized = merges.foldLeft(
          langWords.select(col("lang"), col("word"), col("cnt"),
            split(col("word"), "").as("syms"))) {
        case (df, (a, b)) => df.withColumn("syms", mergeOnce(col("syms"), a, b))
      }
      val agg = tokenized.groupBy(col("lang"))
        .agg(sum(col("cnt")).as("occ"),
          sum(col("cnt") * size(col("syms"))).as("toks"),
          sum(col("cnt") * length(col("word"))).as("chars"))
      val tot = wd.groupBy(col("lang")).agg(count(lit(1)).as("n_all"))
      agg.join(tot, Seq("lang"))
        .select(col("lang"), col("occ").cast("long").as("n_occ"),
          round(col("toks") * lit(1.0) / col("occ"), 6).as("fertility"),
          round(col("chars") * lit(1.0) / col("toks"), 6).as("chars_per_token"),
          round((col("n_all") - col("occ")) * lit(1.0) / col("n_all"), 6)
            .as("bypass_share"))
        .orderBy(col("lang"))
    },

    // ---- maximal duplicated-span coalescing: substring dedup, half 2 ----
    // q108 reports WHICH 8-word spans repeat across documents; this emits
    // WHAT TO REMOVE: per-document maximal repeated spans, formed by
    // merging overlapping/touching duplicated gram windows (the union of
    // [pos, pos+7] intervals — the published substring-dedup pipelines cut
    // exactly these intervals from each document). Every value is
    // deterministic integer arithmetic ⇒ strict oracle. Both engines run
    // the identical derivation: grams with positions → cross-doc dup set →
    // per-doc gaps-and-islands (break when the start gap exceeds 8) →
    // interval bounds per island.
    Q("q141_dup_span_coalesce",
      raw"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
           |           FROM documents),
           |g AS (SELECT doc_id, s['pos'] AS pos, s['gram'] AS gram FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(words) - ${GramWords - 2}, 1)),
           |      i -> {'pos': i, 'gram': array_to_string(list_slice(words, i, i + ${GramWords - 1}), ' ')})) AS s
           |    FROM w)),
           |d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
           |f AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
           |b AS (SELECT doc_id, pos,
           |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $GramWords
           |         THEN 0 ELSE 1 END AS brk
           |  FROM f),
           |i AS (SELECT doc_id, pos,
           |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
           |  FROM b)
           |SELECT doc_id, min(pos) AS span_start, max(pos) + ${GramWords - 1} AS span_end,
           |  max(pos) - min(pos) + $GramWords AS span_words,
           |  count(*) AS n_grams
           |FROM i GROUP BY doc_id, island
           |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
      dupSpanIntervals(s, dir).orderBy(col("doc_id"), col("span_start"))
    },

    // ---- span-removal APPLY: cut the q141 intervals out of each doc ----
    // q141 computes WHAT to remove; this applies it — the rewrite pass a
    // production substring-dedup pipeline actually ships: every word whose
    // 1-based position falls inside one of the doc's maximal duplicated
    // spans is dropped, and the residual document (surviving words joined
    // by ' ', in order, over the same lowercased-trim tokenization) is
    // emitted as an md5 so the full rewrite is strict-checkable without
    // hauling text through the compare. Scale shape: intervals per doc are
    // few and already per-doc (one collect_list groupBy on doc_id — a
    // high-cardinality key), the apply is ONE equi-join on doc_id followed
    // by a scan-speed higher-order filter (no per-word explode join, no
    // window); docs without removals never enter the join (inner). The
    // intervals are maximal ⇒ pairwise disjoint ⇒ removed_words is their
    // exact width sum and kept = n_words − removed always; the oracle
    // re-derives both sides independently and must hash-match.
    Q("q151_span_removal_apply",
      raw"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
           |           FROM documents),
           |g AS (SELECT doc_id, s['pos'] AS pos, s['gram'] AS gram FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(words) - ${GramWords - 2}, 1)),
           |      i -> {'pos': i, 'gram': array_to_string(list_slice(words, i, i + ${GramWords - 1}), ' ')})) AS s
           |    FROM w)),
           |d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
           |f AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
           |b AS (SELECT doc_id, pos,
           |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $GramWords
           |         THEN 0 ELSE 1 END AS brk
           |  FROM f),
           |i AS (SELECT doc_id, pos,
           |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
           |  FROM b),
           |iv AS (SELECT doc_id, min(pos) AS span_start, max(pos) + ${GramWords - 1} AS span_end
           |  FROM i GROUP BY doc_id, island),
           |ivd AS (SELECT doc_id, sum(span_end - span_start + 1) AS removed_words
           |  FROM iv GROUP BY doc_id),
           |pos AS (SELECT doc_id, s['p'] AS p, s['wd'] AS wd FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
           |      j -> {'p': j, 'wd': words[j]})) AS s
           |    FROM w WHERE doc_id IN (SELECT doc_id FROM iv))),
           |k AS (SELECT p.doc_id, p.p, p.wd
           |  FROM pos p LEFT JOIN iv v
           |    ON p.doc_id = v.doc_id AND p.p BETWEEN v.span_start AND v.span_end
           |  WHERE v.doc_id IS NULL),
           |res AS (SELECT doc_id, count(*) AS kept_words,
           |    md5(string_agg(wd, ' ' ORDER BY p)) AS residual_md5
           |  FROM k GROUP BY doc_id)
           |SELECT w.doc_id, CAST(len(w.words) AS BIGINT) AS n_words,
           |  CAST(ivd.removed_words AS BIGINT) AS removed_words,
           |  CAST(coalesce(res.kept_words, 0) AS BIGINT) AS kept_words,
           |  coalesce(res.residual_md5, md5('')) AS residual_md5
           |FROM w JOIN ivd USING (doc_id) LEFT JOIN res USING (doc_id)
           |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      applySpanRemoval(
        t(s, dir, "documents").select(col("doc_id"), wordsCol.as("w")),
        dupSpanIntervals(s, dir))
        .orderBy(col("doc_id"))
    },

    // ---- shingle-set containment: near-superset / quotation detection ----
    // Jaccard (q42) under-scores a short document embedded in a long one
    // (|A∩B|/|A∪B| stays small when |B|≫|A|); containment |A∩B|/min(|A|,|B|)
    // is the standard directional fix (Broder's "containment" measure) and
    // is what catches quotes, excerpts, and template supersets. Same
    // persisted 8-byte shingle-hash frame and equi-join candidate
    // generation as the rest of the dedup family — only the denominator
    // changes, so everything proven about q42's scale behavior (capped df,
    // linear candidates) transfers unchanged.
    Q("q112_shingle_containment",
      s"""${TextDedup.ShingleCte},
         |hs AS (SELECT doc_id, h1 AS h FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
         |  FROM hs x JOIN hs y ON x.h = y.h AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(i * 1.0 / least(sa.n, sb.n), 6) AS containment
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE i * 1.0 / least(sa.n, sb.n) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      // conf-gated like q42: OFF for the oracle check (exact), ON at scale
      // via graft.textdedup.maxShingleDf — ScaleBench's containment phases
      // measure both paths
      containmentFrom(
        TextDedup.cappedShingleRows(s, dir).select(col("doc_id"), col("h1").as("h")))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- containment under the doc-frequency skew cap (q100 treatment) --
    // The q112 pipeline with the stop-shingle cap ACTIVE (maxDf=3, same
    // bound as q100) and the identical HAVING filter in the oracle's CTE.
    // The containment join shares q42/q100's C(df,2) hot-shingle pathology
    // — a boilerplate-heavy corpus funnels quadratic pairs through the very
    // same equi-join — so the mitigated path needs its own strict oracle
    // check, not an inherited claim. Capped containment values legitimately
    // differ from q112's exact ones (dropping ubiquitous shingles shrinks
    // intersection and min-size); both engines compute the same capped
    // statistic. ScaleBench's containment phases chart the growth cap-off
    // vs cap-on.
    Q("q119_containment_capped",
      s"""${TextDedup.ShingleCte},
         |keep AS (SELECT h1 FROM sh GROUP BY h1 HAVING count(*) <= 3),
         |hs AS (SELECT doc_id, h1 AS h FROM sh JOIN keep USING (h1)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
         |  FROM hs x JOIN hs y ON x.h = y.h AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(i * 1.0 / least(sa.n, sb.n), 6) AS containment
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE i * 1.0 / least(sa.n, sb.n) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val capped = TextDedup.capDocFrequency(
        TextDedup.shingleRows(s, dir), maxDf = 3, key = "h1")
      containmentFrom(capped.select(col("doc_id"), col("h1").as("h")))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )

  /** The containment join + threshold over any (doc_id, h) shingle frame —
    * shared by the exact (q112) and capped (q119) variants so the two can
    * never drift. Returns the UNSORTED (doc_a, doc_b, containment) frame. */
  private[ops] def containmentFrom(hs: DataFrame): DataFrame = {
    val sizes = hs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = hs.as("x").join(hs.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    val cont = col("i") * lit(1.0) / least(col("sa.n"), col("sb.n"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(cont >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(cont, 6).as("containment"))
  }
}
