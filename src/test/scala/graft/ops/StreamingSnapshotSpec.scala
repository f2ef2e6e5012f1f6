package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class SnapPage(doc_id: Long, text: String)

/** q326's streaming composition: snapshot N arrives as a stream of
  * fetched pages (the crawl's landing order), each micro-batch reduced
  * to (page, fingerprint) rows under the batch_id-keyed idempotent
  * store; the delta report vs the static snapshot N−1 is recomputed
  * from the accumulated store — the q166/q205 refresh idiom. Pinned:
  * the final streamed report equals the batch q326 shape over the same
  * pages, pages re-fetched in a later batch take the LATEST fingerprint
  * (the crawl-overwrite rule), and a replayed batch changes nothing. */
class StreamingSnapshotSpec extends SparkSpec {

  test("streamed delta == batch delta; re-fetch updates; replay is a no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-snap").toString
    val raw = s"$root/pages"

    // snapshot A (previous crawl): pages 1..4
    val snapA = Seq(
      (1L, "alpha page body"), (2L, "beta page body"),
      (3L, "gamma page body"), (4L, "delta page body"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("fa"))

    // snapshot B arrives in two batches: 1 unchanged, 2 changed, 5 new;
    // page 4 never re-fetched (gone); page 2 re-fetched TWICE — the
    // second fetch (batch 1) must win
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.select(col("doc_id"), md5(col("text")).as("fb"),
          lit(batchId).as("bid"))
        .write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[SnapPage](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(SnapPage(1L, "alpha page body"), SnapPage(2L, "beta draft"))
      q.processAllAvailable()
      mem.addData(SnapPage(2L, "beta page body v2"), SnapPage(5L, "epsilon page body"))
      q.processAllAvailable()
    } finally q.stop()

    def snapB: DataFrame = {
      val st = s.read.option("basePath", raw).parquet(raw)
      // latest fetch wins: max batch id per page, then its fingerprint
      val latest = st.groupBy(col("doc_id")).agg(max(col("bid")).as("bid"))
      st.join(latest, Seq("doc_id", "bid")).select(col("doc_id"), col("fb"))
    }
    def report(): Map[String, Long] =
      snapA.join(snapB, Seq("doc_id"), "full_outer")
        .select(when(col("fa").isNull, "new")
          .when(col("fb").isNull, "gone")
          .when(col("fa") =!= col("fb"), "changed")
          .otherwise("unchanged").as("st"))
        .groupBy(col("st")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap

    val streamed = report()
    // page 1 unchanged, page 2 changed (second fetch differs from A),
    // page 3 and 4 gone (never fetched in B), page 5 new
    assert(streamed === Map("unchanged" -> 1L, "changed" -> 1L,
      "gone" -> 2L, "new" -> 1L), streamed.toString)

    // replay of batch 1: idempotent overwrite, nothing changes
    sinkBody(Seq(SnapPage(2L, "beta page body v2"), SnapPage(5L, "epsilon page body"))
      .toDF("doc_id", "text"), 1L)
    assert(report() === streamed, "replayed batch must be a no-op")

    // streamed == batch: one-shot B through the same classifier
    val bAll = Seq((1L, "alpha page body"), (2L, "beta page body v2"),
      (5L, "epsilon page body")).toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("fb"))
    val batchRep = snapA.join(bAll, Seq("doc_id"), "full_outer")
      .select(when(col("fa").isNull, "new")
        .when(col("fb").isNull, "gone")
        .when(col("fa") =!= col("fb"), "changed")
        .otherwise("unchanged").as("st"))
      .groupBy(col("st")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(batchRep === streamed, "streamed store and batch delta disagree")
  }
}
