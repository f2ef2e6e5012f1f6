package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class SnapDoc(doc_id: Long, text: String)

/** q322's crawl-snapshot admission report composed with the reference's
  * continuous-ingest core: crawl documents arrive in micro-batches, each
  * batch runs the SAME per-doc metric seam the batch query runs
  * (WarcOps.snapshotMetrics — robots evaluator, charset sniffer, full
  * extraction chain, canonicalizer) and lands the NARROW per-doc rows
  * into a batch_id-keyed idempotent store; the admission report is a
  * re-aggregation of the accumulated store (per-host sums are
  * monotone-mergeable; the count-distinct re-aggregates from the stored
  * canonicals). The spec pins: the incremental report after every batch
  * equals the batch q322 run over the union corpus written as a
  * documents table, and a replayed batch id is a no-op. */
class StreamingCrawlReportSpec extends SparkSpec {

  // doc_ids chosen so two hosts (id % 50 ∈ {1, 2}) accumulate docs
  // ACROSS batches — the report rows must change between batches
  private val b1 = Seq(SnapDoc(1L, "alpha beta gamma delta"),
    SnapDoc(2L, "epsilon zeta eta theta"))
  private val b2 = Seq(SnapDoc(51L, "iota kappa lambda mu"),
    SnapDoc(52L, "nu xi omicron pi"),
    SnapDoc(103L, "rho sigma tau upsilon"))

  test("streaming crawl report: idempotent store, incremental == batch q322") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-snap").toString
    val store = s"$root/metrics"

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      WarcOps.snapshotMetrics(batch)
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[SnapDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def incrementalReport: Seq[Seq[Any]] =
      WarcOps.snapshotReport(s.read.parquet(store)
          .select("host", "probes", "allowed", "cs", "clean", "page",
            "n_variants", "canonical"))
        .collect().toSeq.map(_.toSeq)

    def batchReport(docs: Seq[SnapDoc]): Seq[Seq[Any]] = {
      val dir = java.nio.file.Files.createTempDirectory("snap-docs").toString
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      graft.SparkEntry.queries("q322_crawl_quality_report")(s, dir)
        .collect().toSeq.map(_.toSeq)
    }

    try {
      mem.addData(b1: _*); q.processAllAvailable()
      assert(incrementalReport === batchReport(b1), "batch-1 report diverged")

      mem.addData(b2: _*); q.processAllAvailable()
      val inc2 = incrementalReport
      assert(inc2 === batchReport(b1 ++ b2), "batch-2 report diverged")
      // hosts 1 and 2 really accumulated across batches
      val byHost = inc2.map(r => r.head.toString -> r(1)).toMap
      assert(byHost("crawl-1.test") === 2L && byHost("crawl-2.test") === 2L,
        s"cross-batch accumulation missing: $byHost")

      // a replayed batch id is a no-op (the S12 idempotence discipline)
      sinkBody(b2.toDF("doc_id", "text"), 1L)
      assert(incrementalReport === inc2, "replay changed the report")
    } finally q.stop()
  }
}
