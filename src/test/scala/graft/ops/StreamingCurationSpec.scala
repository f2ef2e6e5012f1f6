package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build an Encoder (inner classes lack a
// reachable outer scope for newInstance)
case class ChunkDoc(doc_id: Long, text: String)

/** The LLM-pipeline curation operators must compose with the reference's
  * streaming core (SURVEY.md §2.1 S10–S12): q85's chunk-level dedup run
  * INCREMENTALLY — per-micro-batch map-side fingerprint extraction into a
  * batch_id-keyed idempotent store (the Pipeline sink discipline), with
  * the duplicate report aggregated over the accumulated store — must
  * equal the one-shot batch answer, including duplicates whose members
  * arrive in DIFFERENT batches. */
class StreamingCurationSpec extends SparkSpec {

  private def words(prefix: String): String =
    (1 to 10).map(i => s"$prefix$i").mkString(" ")

  test("chunk dedup composes with foreachBatch + idempotent batch_id sink") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-chunks").toString
    val store = s"$root/chunks"
    // batch 1: docs 1,2 — chunk A shared within the batch
    // batch 2: docs 3,4 — doc 3 repeats chunk A (cross-batch duplicate),
    //          doc 4 repeats its own chunk D twice (per-doc distinct)
    val b1 = Seq(
      ChunkDoc(1L, s"${words("a")} ${words("b")}"),
      ChunkDoc(2L, s"${words("a")} ${words("c")}"))
    val b2 = Seq(
      ChunkDoc(3L, s"${words("a")} ${words("d")}"),
      ChunkDoc(4L, s"${words("d")} ${words("d")}"))
    val mem = MemoryStream[ChunkDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the same map-side stage the batch query runs, landed exactly
        // like Pipeline's sink: overwrite-by-batch_id, so a checkpoint
        // replay of a batch cannot double its fingerprints
        Curation.chunkFingerprints(batch)
          .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")
      }
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // report over the accumulated store; distinct() collapses a doc
    // re-sent across batches (application-level reprocessing — batch_id
    // overwrite already covers engine-level replays of the same batch)
    val streamed = Curation.chunkDupReport(
        s.read.parquet(store).select("doc_id", "fp").distinct())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = Curation.chunkDupReport(
        Curation.chunkFingerprints((b1 ++ b2).toDF()))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty, "expected at least the cross-batch duplicate")
    assert(streamed == batch,
      s"incremental end-state diverges from the batch answer:\n$streamed\nvs\n$batch")
    // the cross-batch duplicate is really there: chunk A spans docs 1,2,3
    val aDup = streamed.find(_._2 == 3L)
    assert(aDup.exists(_._3 == 1L), s"chunk A should span 3 docs, keeper 1: $streamed")
  }
}
