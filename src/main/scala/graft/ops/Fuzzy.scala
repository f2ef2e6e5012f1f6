package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t
import TextCommon.wordsCol

/** Fuzzy string-matching surface: the ClickHouse string-distance family
  * (`jaroSimilarity` / `jaroWinklerSimilarity` /
  * `damerauLevenshteinDistance` / `editDistance`,
  * string-functions/string-distance docs) over the landed corpus — the
  * record-linkage companion to the n-gram similarity ops (q42 Jaccard,
  * q180 blocked edit distance, q201 ngramDistance).
  *
  * Spark ships only `levenshtein`; Jaro, Jaro–Winkler and unrestricted
  * Damerau–Levenshtein are native codegen'd expressions
  * ([[graft.functions.StringSim]]) with semantics pinned byte-for-byte to
  * the DuckDB oracle functions (probe constants asserted in
  * StringSimSpec).
  *
  * Scale: the vocabulary aggregate is one map-side-combined groupBy; the
  * per-language top-15 cut is a bounded per-group window (the grouped-rank
  * idiom — each language's vocab sorts inside its own hash partition with
  * the external sorter); the pair generator then works on ≤ 15 words per
  * language with a first-byte block, so the O(|a|·|b|) distance kernels
  * only ever see a constant-size candidate set — never corpus × corpus.
  */
object Fuzzy {

  def qs: Seq[Q] = Seq(

    // ---- string-distance battery (jaro/jaroWinkler/damerau/edit) ----
    Q("q257_string_distances",
      """WITH w AS (SELECT lang, word, count(*) AS freq
        |  FROM (SELECT lang,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |        FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]{4,12}$')
        |  GROUP BY lang, word),
        |top AS (SELECT lang, word FROM (
        |    SELECT lang, word,
        |      row_number() OVER (PARTITION BY lang
        |        ORDER BY freq DESC, word) AS rn
        |    FROM w) WHERE rn <= 15)
        |SELECT a.lang AS lang, a.word AS w1, b.word AS w2,
        |  CAST(levenshtein(a.word, b.word) AS BIGINT) AS lev,
        |  CAST(damerau_levenshtein(a.word, b.word) AS BIGINT) AS dam,
        |  round(jaro_similarity(a.word, b.word), 6) AS jaro,
        |  round(jaro_winkler_similarity(a.word, b.word), 6) AS jw
        |FROM top a JOIN top b
        |  ON a.lang = b.lang AND substr(a.word, 1, 1) = substr(b.word, 1, 1)
        |  AND a.word < b.word
        |ORDER BY lang, w1, w2""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val words = t(s, dir, "documents")
        .select(col("lang"), explode(wordsCol).as("word"))
        .filter(col("word").rlike("^[a-z]{4,12}$"))
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("freq"))
      val top = words
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("freq").desc, col("word"))))
        .filter(col("rn") <= 15)
        .select(col("lang"), col("word"))
      val a = top.select(col("lang"), col("word").as("w1"))
      val b = top.select(col("lang"), col("word").as("w2"))
      a.join(b, Seq("lang"))
        .filter(substring(col("w1"), 1, 1) === substring(col("w2"), 1, 1) &&
          col("w1") < col("w2"))
        .select(col("lang"), col("w1"), col("w2"),
          levenshtein(col("w1"), col("w2")).cast("long").as("lev"),
          expr("graft_damerau(w1, w2)").cast("long").as("dam"),
          round(expr("graft_jaro(w1, w2)"), 6).as("jaro"),
          round(expr("graft_jaro_winkler(w1, w2)"), 6).as("jw"))
        .orderBy(col("lang"), col("w1"), col("w2"))
    }
  )
}
