package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Hashed-n-gram linear classifier INFERENCE — the fastText shape that
  * model-based corpus filtering runs at scale (a quality classifier
  * scoring every document is the modern successor to q47's hand rules):
  * features are hashed bigrams, the model is a weight table indexed by
  * the hash bucket, and the score is one sparse dot product per
  * document. At 100 TB this is the highest-volume model-inference query
  * a curation pipeline runs, and its whole cost is the feature hash —
  * which is why the bucket rides `graft_md5_split` (the codegen'd
  * digest-bytes expression) rather than an md5-hex + conv string parse.
  *
  * The weight table is a closed-form function of the bucket (an integer
  * in [-500, 500] from a Knuth-multiplicative mix), so the DuckDB oracle
  * recomputes the exact integer score per document: hashing, bucketing,
  * the weight lookup, and the aggregation are all pinned, and the
  * keep/drop decision is checked as a derived column. Everything is
  * exact integer arithmetic — no float drift channel.
  *
  * Plan shape: scan → generator (bigrams) → codegen'd hash → partial
  * hash aggregate (map-side combine on doc_id) → final aggregate; the
  * shuffle carries one (doc_id, count, score) row per document.
  */
object ClassifierOps {

  private[ops] val Buckets = 4096L

  val qs: Seq[Q] = Seq(

    Q("q313_hashed_classifier",
      raw"""WITH w AS (SELECT doc_id,
         |    string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |    i -> md5(ws[i] || ' ' || ws[i+1]))) AS m FROM w),
         |b AS (SELECT doc_id,
         |    (${TextCommon.duckHex("m", 14)}) % $Buckets AS bk FROM g),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum((bk * 2654435761) % 1001 - 500) AS BIGINT) AS score
         |  FROM b GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, score,
         |  CASE WHEN score > 0 THEN 'keep' ELSE 'drop' END AS label
         |FROM sc
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val ws = split(lower(trim(coalesce(col("text"), lit("")))), raw"\s+", -1)
      val bigrams = zip_with(
        slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
        slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      t(s, dir, "documents")
        .select(col("doc_id"), explode(bigrams).as("bg"))
        .select(col("doc_id"),
          pmod(call_function("graft_md5_split", col("bg")).getItem(0),
            lit(Buckets)).as("bk"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          sum(col("bk") * lit(2654435761L) % 1001 - 500)
            .cast("long").as("score"))
        .withColumn("label",
          when(col("score") > 0, lit("keep")).otherwise(lit("drop")))
        .orderBy(col("doc_id"))
    }
  )
}
