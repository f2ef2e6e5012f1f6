package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Cross-snapshot crawl delta — the accounting a recurring 100 TB crawl
  * runs between snapshot N−1 and N before deciding what to re-process:
  * which canonical pages are new, gone, content-changed, or unchanged,
  * rolled up per source host. Complements q322 (single-snapshot
  * admission) and the StreamingSelection incremental dedup; the
  * reference has no multi-snapshot notion (one consume loop,
  * `/root/reference/cmd/kafka-consumer/main.go:58-111`) — this extends
  * the crawl-governance surface per the north star.
  *
  * Engine shape at 100 TB: project each snapshot to (page_key,
  * content_fp, host) FIRST — the full-outer join then moves 16-byte md5
  * fingerprints, never document text — and join on the canonical page
  * key (q309's canonicalization upstream). Two snapshot tables bucketed
  * by page-key hash make the join zero-shuffle; unbucketed, it is one
  * hash-partitioned SMJ whose width is keys+fingerprints only. The
  * per-host rollup is a second, tiny aggregate.
  *
  * Two-snapshot carve on the single documents table (synthetic, applied
  * identically in both engines): snapshot A = doc_id % 7 ≠ 0, snapshot
  * B = doc_id % 5 ≠ 0, and B re-crawls pages doc_id % 3 = 0 with a
  * deterministic revision suffix — so every class (new/gone/changed/
  * unchanged) is populated and the CLASSIFIER still works off real
  * fingerprint comparison, not the carve rule.
  */
object SnapshotOps {

  val qs: Seq[Q] = Seq(

    // ---- q326: snapshot delta per source host ----
    Q("q326_snapshot_delta",
      """WITH a AS (SELECT doc_id, source,
        |    md5(coalesce(text, '')) AS f
        |  FROM documents WHERE doc_id % 7 <> 0),
        |b AS (SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 3 = 0
        |        THEN coalesce(text, '') || ' [rev2]'
        |        ELSE coalesce(text, '') END) AS f
        |  FROM documents WHERE doc_id % 5 <> 0),
        |j AS (SELECT coalesce(a.source, b.source) AS source,
        |    CASE WHEN a.doc_id IS NULL THEN 'new'
        |         WHEN b.doc_id IS NULL THEN 'gone'
        |         WHEN a.f <> b.f THEN 'changed'
        |         ELSE 'unchanged' END AS st
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT source,
        |  CAST(sum(CASE WHEN st = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN st = 'gone' THEN 1 ELSE 0 END) AS BIGINT) AS n_gone,
        |  CAST(sum(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(sum(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
        |  round(sum(CASE WHEN st <> 'unchanged' THEN 1 ELSE 0 END) * 1.0
        |    / count(*), 6) AS churn
        |FROM j GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), coalesce(col("text"), lit("")).as("text"))
      val a = d.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source").as("sa"), md5(col("text")).as("fa"))
      val b = d.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("source").as("sb"),
          md5(when(col("doc_id") % 3 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text"))).as("fb"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(coalesce(col("sa"), col("sb")).as("source"),
          when(col("fa").isNull, "new")
            .when(col("fb").isNull, "gone")
            .when(col("fa") =!= col("fb"), "changed")
            .otherwise("unchanged").as("st"))
        .groupBy(col("source"))
        .agg(
          sum(when(col("st") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("st") === "gone", 1L).otherwise(0L)).as("n_gone"),
          sum(when(col("st") === "changed", 1L).otherwise(0L)).as("n_changed"),
          sum(when(col("st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
          round(sum(when(col("st") =!= "unchanged", 1L).otherwise(0L))
            * lit(1.0) / count(lit(1)), 6).as("churn"))
        .orderBy(col("source"))
    }
  )
}
