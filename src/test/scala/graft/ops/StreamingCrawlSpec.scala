package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class CrawlDoc(doc_id: Long, text: String)

/** The crawl-ingest family (q306) composed with the reference's
  * continuous-ingest core: WARC segments arrive in micro-batches, each
  * batch runs the SAME gzip→WARC/HTTP→HTML extraction seam the batch
  * query runs, and lands (doc_id, text_md5) into a batch_id-keyed
  * idempotent store — the S12 dead-letter/idempotence discipline. Like
  * the image family, extraction is per-doc map work and the downstream
  * EXACT-DEDUP group set is monotone, so cross-batch dup discovery is
  * just a re-aggregation of the accumulated store. The spec plants a
  * cross-batch exact dup, asserts it is invisible after batch 1 and
  * found after batch 2, that the store equals the all-at-once batch
  * extraction, and that a replayed batch id is a no-op. */
class StreamingCrawlSpec extends SparkSpec {

  private val dupText = "identical page body that recurs across two crawl batches"
  private val b1 = Seq(
    CrawlDoc(11L, dupText),
    CrawlDoc(12L, "first unique page body with its own words"))
  private val b2 = Seq(
    CrawlDoc(13L, dupText), // the cross-batch dup
    CrawlDoc(14L, "second unique page body unlike the others"))

  /** The SAME extraction seam q306 runs (synthesize → walk → extract),
    * not a re-derivation that could drift from it. */
  private def extractOf(batch: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    batch.as[CrawlDoc].mapPartitions(_.map { d =>
      val (_, responses) = WarcOps.walk(WarcOps.crawlBytes(d.doc_id, d.text))
      val pages = responses.filter(r =>
        r.statusCode == 200 && r.contentType.startsWith("text/html"))
      val content = pages.map(p => HtmlOps.extract(new String(p.body,
        java.nio.charset.StandardCharsets.UTF_8)).content).mkString
      (d.doc_id, Md5Hex.of(content))
    }).toDF("doc_id", "text_md5")
  }

  test("streaming crawl extraction: idempotent store, monotone dedup groups") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-crawl").toString
    val store = s"$root/extracted"

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      extractOf(batch).write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[CrawlDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def storeDF = s.read.parquet(store).select("doc_id", "text_md5")
    def dupGroups = storeDF.groupBy("text_md5").count()
      .filter($"count" > 1).collect().map(_.getLong(1)).toSeq

    try {
      mem.addData(b1: _*); q.processAllAvailable()
      assert(storeDF.count() === 2)
      assert(dupGroups.isEmpty, "no dup group may exist after batch 1")

      mem.addData(b2: _*); q.processAllAvailable()
      assert(storeDF.count() === 4)
      assert(dupGroups === Seq(2L), "the cross-batch dup must surface")

      // the accumulated store equals the all-at-once batch extraction
      val batchAll = extractOf((b1 ++ b2).toDF())
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val streamed = storeDF.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === batchAll)

      // replaying batch 0 (same batch_id, same rows) is a no-op
      sinkBody(b1.toDF(), 0L)
      assert(storeDF.count() === 4)
      assert(dupGroups === Seq(2L))
    } finally q.stop()
  }
}
