package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Crawl-frontier scheduling — the politeness-sharded fetch order that
  * sits between q309/q310 (what MAY be fetched) and q303 (what WAS
  * fetched): order every candidate page so that (a) higher-value pages
  * of a host go first and (b) consecutive fetches of the SAME host are
  * always exactly |hosts| slots apart — the round-robin interleave
  * every production frontier (Heritrix/Nutch shape) uses to respect
  * per-host crawl-delay without idling the fleet. The reference has no
  * frontier notion (it consumes what Kafka hands it); this completes
  * the crawl-governance family per the north star.
  *
  * The schedule is pure arithmetic: per-host priority rank r (1-based)
  * and host index h (0-based) give slot = (r−1)·H + h, which is
  * injective over all (r, h) — no coordination, no global sort of the
  * frontier. Scale shape: the per-host rank is a window whose PARTITION
  * key cardinality grows with the corpus (hosts) while each partition
  * is bounded by the per-host crawl budget — the healthy window shape
  * (contrast the per-language ntile the round-14 verdict flagged);
  * the host-index table is dimension-sized and broadcast. The audit
  * output makes the politeness contract part of the hash compare:
  * min_gap = max_gap = H for every host with ≥2 pages.
  */
object FrontierOps {

  val qs: Seq[Q] = Seq(

    // ---- q331: politeness-sharded frontier schedule ----
    Q("q331_frontier_schedule",
      """WITH hosts AS (SELECT source,
        |    row_number() OVER (ORDER BY source) - 1 AS h
        |  FROM (SELECT DISTINCT source FROM documents)),
        |nh AS (SELECT count(*) AS n FROM hosts),
        |pg AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS r
        |  FROM documents),
        |slots AS (SELECT p.source, p.doc_id,
        |    (p.r - 1) * nh.n + hosts.h AS slot
        |  FROM pg p JOIN hosts USING (source), nh),
        |gaps AS (SELECT source, slot,
        |    slot - lag(slot) OVER (PARTITION BY source ORDER BY slot) AS g
        |  FROM slots)
        |SELECT source AS host,
        |  CAST(count(*) AS BIGINT) AS n_pages,
        |  min(slot) AS first_slot, max(slot) AS last_slot,
        |  CAST(min(g) AS BIGINT) AS min_gap,
        |  CAST(max(g) AS BIGINT) AS max_gap
        |FROM gaps GROUP BY source ORDER BY host""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      // global window over the host DIMENSION only (distinct hosts —
      // the bounded Skew-offset posture, not a corpus sort); beyond
      // ~10^7 hosts this becomes Skew.groupedRowNumber's stitched rank
      val hosts = d.select(col("source")).distinct()
        .withColumn("h", row_number().over(Window.orderBy(col("source"))) - 1)
      val nh = hosts.agg(count(lit(1)).as("n"))
      val pg = d.select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("n_chars").desc, col("doc_id"))))
      val slots = pg.join(broadcast(hosts), Seq("source"))
        .crossJoin(broadcast(nh))
        .select(col("source"), col("doc_id"),
          ((col("r") - 1) * col("n") + col("h")).as("slot"))
      val gaps = slots.withColumn("g",
        col("slot") - lag(col("slot"), 1).over(
          Window.partitionBy(col("source")).orderBy(col("slot"))))
      gaps.groupBy(col("source").as("host"))
        .agg(count(lit(1)).cast("long").as("n_pages"),
          min(col("slot")).as("first_slot"), max(col("slot")).as("last_slot"),
          min(col("g")).cast("long").as("min_gap"),
          max(col("g")).cast("long").as("max_gap"))
        .orderBy(col("host"))
    }
  )
}
