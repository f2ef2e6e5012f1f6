package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder (a suite-nested case
// class has no reachable outer instance)
case class MinHashDoc(doc_id: Long, text: String)

/** The flagship near-dup path (q41 MinHash+LSH) must compose with the
  * reference's continuous-ingest core (SURVEY.md §2.1 S10–S12), the same
  * way chunk dedup does (StreamingCurationSpec): per-micro-batch map-side
  * signature+banding into a batch_id-keyed idempotent store — the Pipeline
  * sink discipline — with candidate generation aggregated over the
  * accumulated band rows.
  *
  * The decomposition is sound because a document's MinHash signature
  * depends only on its OWN shingles: per-batch [[TextDedup.bandRows]]
  * output is identical to what the batch-global pipeline computes for the
  * same docs, so the accumulated store feeds [[TextDedup.bandCandidates]]
  * exactly as a one-shot frame would. The spec drives THREE batches with a
  * candidate pair spanning batches 1 and 3, then REPLAYS a batch through
  * the same sink body (what a checkpoint recovery does after a crash
  * between sink write and offset commit) and asserts the end-state
  * candidate set is byte-identical to the batch answer both times. */
class StreamingMinHashSpec extends SparkSpec {

  /** ~30 words so each doc has plenty of 3-shingles. */
  private def doc(seed: String): String =
    (1 to 30).map(i => s"$seed$i").mkString(" ")

  test("MinHash/LSH dedup composes with foreachBatch + idempotent batch_id sink") {
    runComposition()
  }

  test("composition holds under a non-default signature width (64 hashes, 4-row bands)") {
    // the conf-gated width (graft.minhash.hashes/bandRows) is the real-
    // corpus recall path; the incremental decomposition must be width-
    // agnostic because a signature still depends only on the doc's own
    // shingles, whatever k — proven by running the same three-batch drive
    val s = spark
    s.conf.set("graft.minhash.hashes", "64")
    s.conf.set("graft.minhash.bandRows", "4")
    try runComposition()
    finally {
      s.conf.unset("graft.minhash.hashes")
      s.conf.unset("graft.minhash.bandRows")
    }
  }

  private def runComposition(): Unit = {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-minhash").toString
    val store = s"$root/bands"

    // batch 1: docs 1,2 — identical text (guaranteed all-band collision)
    // batch 2: doc 3 — unrelated; doc 4 — unrelated
    // batch 3: doc 5 — identical to doc 1 (CROSS-BATCH candidate), doc 6 unrelated
    val b1 = Seq(MinHashDoc(1L, doc("alpha")), MinHashDoc(2L, doc("alpha")))
    val b2 = Seq(MinHashDoc(3L, doc("beta")), MinHashDoc(4L, doc("gamma")))
    val b3 = Seq(MinHashDoc(5L, doc("alpha")), MinHashDoc(6L, doc("delta")))

    // the sink body: the SAME map-side stages the batch query runs
    // (shingle → signature → band rows), landed exactly like Pipeline's
    // sink — overwrite-by-batch_id, so an engine-level replay of a batch
    // cannot double its band rows
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      TextDedup.bandRows(TextDedup.shingleRowsFor(batch))
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[MinHashDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def candidates(bands: DataFrame): Seq[(Long, Long)] =
      TextDedup.bandCandidates(bands)
        .orderBy("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // distinct() on the logical band row collapses application-level
    // re-sends of a doc across DIFFERENT batch ids (batch_id overwrite
    // already covers engine-level replays of the SAME batch)
    def endState(): Seq[(Long, Long)] =
      candidates(s.read.parquet(store).drop("batch_id").distinct())

    val batchAnswer = candidates(
      TextDedup.bandRows(TextDedup.shingleRowsFor((b1 ++ b2 ++ b3).toDF())))

    val streamed = candidates(
      s.read.parquet(store).drop("batch_id"))
    assert(streamed.nonEmpty, "expected at least the cross-batch candidate pair")
    assert(streamed == batchAnswer,
      s"incremental end-state diverges from the batch answer:\n$streamed\nvs\n$batchAnswer")
    // the cross-batch pair is really there: docs 1 and 5 arrived 2 batches apart
    assert(streamed.contains((1L, 5L)), s"docs 1/5 should be candidates: $streamed")
    assert(streamed.contains((1L, 2L)) && streamed.contains((2L, 5L)),
      s"identical docs must pair up: $streamed")

    // REPLAY batch 1 through the same sink body (checkpoint recovery after
    // a crash between sink write and offset commit): overwrite-by-batch_id
    // makes it a no-op for the end state
    sinkBody(b1.toDF(), 0L)
    assert(endState() == batchAnswer,
      "replayed batch must not change the end-state candidate set")
  }

  test("bandCandidates rejects frames outside the (doc_id, band, k*) contract") {
    // a stray column starting with 'k' (e.g. 'keeper') must error, not
    // silently become a join key and shrink the candidate set (ADVICE r13)
    val s = spark
    import s.implicits._
    val bands = TextDedup.bandRows(
      TextDedup.shingleRowsFor(Seq((1L, "a b c d e f g")).toDF("doc_id", "text")))
    val e = intercept[IllegalArgumentException](
      TextDedup.bandCandidates(
        bands.withColumn("keeper", org.apache.spark.sql.functions.lit(true))))
    assert(e.getMessage.contains("bandCandidates expects exactly"))
    // and the contract frame itself still works regardless of column order
    assert(TextDedup.bandCandidates(
      bands.select("band", "k1", "doc_id", "k0")).count() === 0)
  }
}
