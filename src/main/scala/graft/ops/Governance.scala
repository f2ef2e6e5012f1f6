package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.Q
import graft.schema.Tables.t

/** Data-governance operators a training-data pipeline runs before a corpus
  * ships: benchmark-contamination detection, PII detection/redaction, and
  * an inverted-index (posting-list) token search — the `hasToken`-style
  * destination search the reference's users run at the ClickHouse end
  * (cf. /root/reference/prepare-functions.go:161-176).
  *
  * All three are STRICT-checked against the DuckDB oracle. */
object Governance {

  // ---------------------------------------------------------------- q223
  /** PII patterns shared verbatim by both engines. The character classes
    * used (`[A-Za-z0-9._%+-]`, `\d`, `\b`) mean the same thing in Java's
    * regex (Spark) and RE2 (DuckDB) — no backreferences, no lookaround,
    * nothing from the divergent corners of either dialect. */
  private val EmailRe = raw"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
  private val PhoneRe = raw"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
  private val Ipv4Re  = raw"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

  /** Redaction order is load-bearing and identical in both engines:
    * emails first (their local parts may embed digit runs), then phones
    * (so `123.456.7890` is a phone, not a malformed IPv4), then IPv4. */
  def redactCol(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, "<EMAIL>")
    val p = regexp_replace(e, PhoneRe, "<PHONE>")
    regexp_replace(p, Ipv4Re, "<IP>")
  }

  /** The per-document PII report over ANY (doc_id, text) frame — exposed
    * so the spec can drive it over planted positives (the synthetic corpus
    * itself is PII-free, which the zero-count oracle rows also verify). */
  def piiReport(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phone"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ipv4"),
      md5(redactCol(col("text"))).as("redacted_md5"))

  // ---------------------------------------------------------------- q222
  /** Train-side contamination counts over hashed 3-word grams. The eval
    * partition (`doc_id % 97 = 0`) stands in for a held-out benchmark
    * suite; gram width is 3 to match the corpus' synthetic vocabulary
    * (production pipelines use 8–13-grams — the plan shape is identical).
    *
    * Scale shape: the gram frame IS the dedup family's memoized
    * [[TextDedup.shingleRows]] cache (16-byte hashed keys, distinct per
    * doc), so contamination rides the exchange the MinHash/Jaccard family
    * already paid for. The eval side is `broadcast()` — a benchmark suite
    * is fixed-size reference data and does not grow with the corpus — so
    * the 100 TB train side is probed map-side with NO shuffle: one narrow
    * aggregate per doc and one broadcast-hash semi-probe. */
  private def contamination(s: SparkSession, dir: String): DataFrame =
    contaminationFor(TextDedup.shingleRows(s, dir))

  /** The contamination report over ANY (doc_id, h1, h2) hashed-gram
    * frame — the batch Q feeds it the memoized per-dir cache; the
    * streaming composition (StreamingContaminationSpec) feeds it the
    * accumulated per-batch store. */
  def contaminationFor(grams: DataFrame): DataFrame = {
    val eval_ = broadcast(
      grams.filter(col("doc_id") % 97 === 0).select(col("h1"), col("h2")).distinct())
    val train = grams.filter(col("doc_id") % 97 =!= 0)
    val hits = train.join(eval_, Seq("h1", "h2"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit") * lit(1.0) / col("n_grams"), 6).as("ratio"))
      .orderBy(col("ratio").desc, col("doc_id"))
  }

  // ---------------------------------------------------------------- q224
  /** Posting rows (token → doc) for tokens of length ≥ 3, distinct per
    * doc — the inverted index. Shared by the AND-query below. */
  private def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextCommon.wordsCol).as("tok"))
      .filter(length(col("tok")) >= 3)
      .distinct()

  def qs: Seq[Q] = Seq(

    // ---- benchmark-contamination detection ----
    // For every train doc: how many of its distinct 3-grams appear
    // anywhere in the eval partition. Joins on the dedup family's
    // (h1, h2) 112-bit md5 split — identical hashes in both engines, so
    // the count parity is exact (the oracle counts the gram STRINGS;
    // 2^-112 collision odds are the family's accepted discipline).
    Q("q222_contamination",
      raw"""WITH w AS (SELECT doc_id,
           |    string_split_regex(lower(trim(text)), '\s+') AS words
           |  FROM documents),
           |g0 AS (SELECT doc_id, unnest(CASE WHEN len(words) >= 3 THEN
           |    list_transform(range(1, len(words) - 1),
           |      i -> concat_ws(' ', words[i], words[i+1], words[i+2]))
           |    ELSE [] END) AS g FROM w),
           |g AS (SELECT DISTINCT doc_id, g FROM g0),
           |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
           |tr AS (SELECT doc_id,
           |    count(*) AS n_grams,
           |    count(CASE WHEN g IN (SELECT g FROM ev) THEN 1 END) AS n_hit
           |  FROM g WHERE doc_id % 97 <> 0 GROUP BY doc_id)
           |SELECT doc_id, n_grams, n_hit,
           |  round(n_hit * 1.0 / n_grams, 6) AS ratio
           |FROM tr WHERE n_hit > 0
           |ORDER BY ratio DESC, doc_id""".stripMargin) { (s, dir) =>
      contamination(s, dir).filter(col("n_hit") > 0)
    },

    // ---- PII detect + redact battery ----
    // Counts per pattern plus the md5 of the redacted text. On the
    // synthetic corpus every count is 0 and redacted_md5 == md5(text) —
    // the oracle verifies exactly that (no false positives); the planted-
    // positive behavior is pinned in GovernanceSpec via piiReport over a
    // synthetic frame. One narrow map over the scan: no shuffle at all
    // until the ORDER BY, which at 100 TB is the report's own sort.
    Q("q223_pii_redact",
      raw"""SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '$EmailRe', 0)) AS BIGINT) AS n_email,
           |  CAST(len(regexp_extract_all(text, '$PhoneRe', 0)) AS BIGINT) AS n_phone,
           |  CAST(len(regexp_extract_all(text, '$Ipv4Re', 0)) AS BIGINT) AS n_ipv4,
           |  md5(regexp_replace(regexp_replace(regexp_replace(text,
           |    '$EmailRe', '<EMAIL>', 'g'),
           |    '$PhoneRe', '<PHONE>', 'g'),
           |    '$Ipv4Re', '<IP>', 'g')) AS redacted_md5
           |FROM documents
           |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      piiReport(t(s, dir, "documents")).orderBy(col("doc_id"))
    },

    // ---- inverted-index AND search ----
    // The three highest-document-frequency tokens (ties by token asc)
    // form the query; a doc matches when it contains ALL of them.
    // Engine shape: posting rows are the index; the query terms are a
    // 3-row broadcast, so the AND is a map-side probe + one narrow
    // aggregate counting matched terms per doc — the posting-list
    // intersection, never a corpus re-scan per term. At 100 TB the
    // posting frame is the only shuffle (distinct on (tok, doc)).
    Q("q224_inverted_index",
      raw"""WITH w AS (SELECT doc_id,
           |    string_split_regex(lower(trim(text)), '\s+') AS words
           |  FROM documents),
           |p AS (SELECT DISTINCT doc_id, unnest(words) AS tok FROM w),
           |p3 AS (SELECT * FROM p WHERE len(tok) >= 3),
           |terms AS (SELECT tok FROM p3 GROUP BY tok
           |  ORDER BY count(*) DESC, tok ASC LIMIT 3)
           |SELECT doc_id, count(*) AS n_terms
           |FROM p3 WHERE tok IN (SELECT tok FROM terms)
           |GROUP BY doc_id HAVING count(*) = 3
           |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val p3 = postings(t(s, dir, "documents"))
      val terms = broadcast(
        p3.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("tok").asc).limit(3)
          .select(col("tok")))
      p3.join(terms, Seq("tok"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_terms"))
        .filter(col("n_terms") === 3)
        .orderBy(col("doc_id"))
    }
  )
}
