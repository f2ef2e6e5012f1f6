package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class ContamDoc(doc_id: Long, text: String)

/** q222's streaming composition: benchmark-contamination monitoring over
  * a landing document feed. Per-batch documents are reduced to their
  * hashed 3-gram rows ([[TextDedup.shingleRowsFor]] — a doc's grams
  * depend only on itself, so per-batch rows ARE the batch-global rows)
  * and land under the batch_id-keyed idempotent store; the report is
  * recomputed over the accumulated store (the q166/q205 refresh idiom).
  * Planted truths: a clean batch adds no contaminated docs, a batch with
  * a leaked eval passage MUST alarm for exactly that doc, and a replayed
  * batch changes nothing. */
class StreamingContaminationSpec extends SparkSpec {

  test("leaked eval passage alarms; clean batch and replay are no-ops") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-contam").toString
    val raw = s"$root/grams"

    // eval partition: doc_id % 97 == 0
    val evalDoc = ContamDoc(97L, "alpha beta gamma delta epsilon zeta eta theta")
    val cleanA = ContamDoc(1L, "one two three four five six seven eight nine")
    val cleanB = ContamDoc(2L, "red green blue cyan magenta yellow black white")
    // leaks a 5-word eval passage -> shares 3 of its 3-grams
    val leaked = ContamDoc(3L, "intro words then beta gamma delta epsilon zeta outro")

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      TextDedup.shingleRowsFor(batch)
        .write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[ContamDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(evalDoc, cleanA); q.processAllAvailable()
      mem.addData(cleanB); q.processAllAvailable()
    } finally q.stop()

    def store = s.read.option("basePath", raw).parquet(raw)
      .select(col("doc_id"), col("h1"), col("h2"))
    def report(): Map[Long, (Long, Long)] =
      Governance.contaminationFor(store).filter(col("n_hit") > 0)
        .select(col("doc_id"), col("n_grams"), col("n_hit"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

    assert(report().isEmpty, "clean batches must not alarm")

    // the leak lands (the pipeline's next trigger)
    sinkBody(Seq(leaked).toDF("doc_id", "text"), 2L)
    val alarmed = report()
    assert(alarmed.keySet == Set(3L), s"expected only doc 3, got $alarmed")
    // 9 words -> 7 grams; the leaked run 'beta..zeta' carries 3 eval grams
    assert(alarmed(3L) == ((7L, 3L)))

    // replay of batch 2 (idempotent overwrite) changes nothing
    sinkBody(Seq(leaked).toDF("doc_id", "text"), 2L)
    assert(report() == alarmed, "replayed batch must be a no-op")

    // streaming == batch: the same docs through the batch core agree
    val allDocs = Seq(evalDoc, cleanA, cleanB, leaked).toDF("doc_id", "text")
    val batchRep = Governance.contaminationFor(TextDedup.shingleRowsFor(allDocs))
      .filter(col("n_hit") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_hit"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(batchRep == alarmed, "streaming store and batch report disagree")
  }
}
