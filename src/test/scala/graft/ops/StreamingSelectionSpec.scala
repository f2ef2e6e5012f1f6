package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q314's CCNet dedup composed with the continuous-ingest core: document
  * batches arrive in crawl order, each batch's segments run the SAME
  * [[SelectionOps.segmentFrame]] seam the batch query runs, are anti-
  * joined against every segment KEPT by earlier batches, deduped within
  * the batch (first occurrence by (doc_id, seg_i)), and appended to a
  * batch_id-keyed idempotent store. Because streaming arrival order here
  * equals doc_id order, the accumulated kept set must equal the batch
  * q314 answer on the union corpus — the incremental path is pinned to
  * the batch semantics, not merely plausible. A replayed batch id is a
  * no-op (S12 idempotence discipline). */
class StreamingSelectionSpec extends SparkSpec {

  // 8-word segments; segB recurs across batches, segE twice within one doc
  private def seg(c: Char) = (1 to 8).map(i => s"$c$i").mkString(" ")
  private val (a, b, c0, d, e) = (seg('a'), seg('b'), seg('c'), seg('d'), seg('e'))
  private val batch1 = Seq(CrawlDoc(20L, s"$a $b"), CrawlDoc(21L, s"$c0 $a"))
  private val batch2 = Seq(CrawlDoc(22L, s"$b $d"), CrawlDoc(23L, s"$e $e"))

  test("cross-batch first-occurrence dedup equals the batch q314 answer") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-sel").toString
    val store = s"$root/kept"

    def sinkBody(batch: DataFrame, batchId: Long): Unit = {
      val segs = SelectionOps.segmentFrame(batch.toDF("doc_id", "text"))
      // a REPLAYED batch must dedup against every batch but its own prior
      // attempt, or replay would erase its own kept rows instead of
      // rewriting them — the store is keyed by batch_id exactly for this
      val prior =
        if (new java.io.File(store).listFiles() == null)
          segs.limit(0).select("h1", "h2")
        else segs.sparkSession.read.parquet(store)
          .filter(col("batch_id") =!= batchId).select("h1", "h2")
      val novel = segs.join(prior, Seq("h1", "h2"), "left_anti")
      val kept = novel.join(
          novel.groupBy("h1", "h2")
            .agg(min(struct($"doc_id", $"seg_i")).as("first")),
          Seq("h1", "h2"))
        .filter($"first.doc_id" === $"doc_id" && $"first.seg_i" === $"seg_i")
        .select("doc_id", "seg_i", "seg", "h1", "h2")
      kept.write.mode("overwrite").parquet(s"$store/batch_id=$batchId")
    }

    val mem = MemoryStream[CrawlDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def storeDF = s.read.parquet(store)
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      // batch 1: segA kept once (doc 20), its doc-21 recurrence dropped
      assert(storeDF.count() === 3)

      mem.addData(batch2: _*); q.processAllAvailable()
      // batch 2: segB (cross-batch dup) dropped; segE kept once (within-doc)
      val kept2 = storeDF.filter($"batch_id" === 1).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(kept2 === Set((22L, 1), (23L, 0)),
        s"batch-2 kept set wrong: $kept2")

      // accumulated store == the batch q314 answer on the union corpus
      val dir = s"$root/asbatch"
      (batch1 ++ batch2).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.parquet(s"$dir/documents.parquet")
      val batchRows = graft.SparkEntry.queries("q314_paragraph_dedup")(s, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val streamedDups = Map(20L -> 0L, 21L -> 1L, 22L -> 1L, 23L -> 1L)
      assert(batchRows === streamedDups,
        s"batch q314 ($batchRows) != streamed dedup ($streamedDups)")
      val streamedKept = storeDF.collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(streamedKept === Set((20L, 0), (20L, 1), (21L, 0), (22L, 1), (23L, 0)))

      // replaying a batch id is a no-op on the accumulated kept set
      sinkBody(batch2.toDF(), 1L)
      assert(storeDF.collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet === streamedKept)
    } finally q.stop()
  }
}
