package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder (a suite-nested case
// class has no reachable outer instance)
case class SlideDoc(doc_id: Long, text: String)

/** The chunk/containment family (q116 sliding chunks → q112-style
  * containment) must compose with the reference's continuous-ingest core
  * exactly like the MinHash family (StreamingMinHashSpec): per-micro-batch
  * map-side chunking into a batch_id-keyed idempotent store, with the
  * containment report aggregated over the accumulated chunk rows.
  *
  * The decomposition is sound because a document's sliding chunks depend
  * only on its OWN text ([[Curation.slidingChunks]] is a map-side explode),
  * so per-batch chunk rows are identical to the batch-global ones for the
  * same docs. The spec drives three batches with a QUOTE pair spanning
  * batches 1 and 3 (doc 5 embeds a long prefix of doc 1 — the directional
  * case containment exists for), then replays a batch through the same
  * sink body and asserts the end-state containment report is byte-identical
  * to the batch answer both times. */
class StreamingChunkContainmentSpec extends SparkSpec {

  private def words(seed: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$seed$i")

  /** doc 1: 45 words → chunk starts 1, 11, 21.
    * doc 5: doc 1's first 35 words + 30 fresh ones (the "quote") → starts
    * 1..41; its first two chunks equal doc 1's, so containment =
    * |∩| / min(3, 5) = 2/3 ≥ 0.6 — a reported pair. Everything else is
    * unrelated filler with ≥25 words (chunked, but shares nothing). */
  private val quoted = words("alpha", 45)
  private val b1 = Seq(
    SlideDoc(1L, quoted.mkString(" ")),
    SlideDoc(2L, words("beta", 40).mkString(" ")))
  private val b2 = Seq(SlideDoc(3L, words("gamma", 55).mkString(" ")))
  private val b3 = Seq(
    SlideDoc(5L, (quoted.take(35) ++ words("omega", 30)).mkString(" ")),
    SlideDoc(6L, words("delta", 30).mkString(" ")))

  /** Containment over (doc_id, chunk_md5) sets — q112's join/threshold
    * core with the chunk fingerprint standing in for the shingle hash. */
  private def report(chunks: DataFrame): Seq[(Long, Long, Double)] =
    SubstringOps.containmentFrom(
        chunks.select(col("doc_id"), col("chunk_md5").as("h")).distinct())
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("sliding chunks + containment compose with foreachBatch + idempotent sink") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-chunks").toString
    val store = s"$root/chunks"

    // the sink body: the SAME map-side chunker the batch query runs,
    // landed like Pipeline's sink — overwrite-by-batch_id, so an
    // engine-level replay of a batch cannot double its chunk rows
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      Curation.slidingChunks(batch)
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[SlideDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def endState(): Seq[(Long, Long, Double)] =
      report(s.read.parquet(store).select("doc_id", "start_pos", "chunk_md5"))

    val batchAnswer = report(Curation.slidingChunks((b1 ++ b2 ++ b3).toDF()))

    val streamed = endState()
    assert(streamed.nonEmpty, "expected the cross-batch quote pair")
    assert(streamed == batchAnswer,
      s"incremental end-state diverges from the batch answer:\n$streamed\nvs\n$batchAnswer")
    // the quote pair is really there, 2 batches apart, at 2/3 containment
    val quotePair = streamed.find(p => p._1 == 1L && p._2 == 5L)
    assert(quotePair.isDefined, s"docs 1/5 should be a containment pair: $streamed")
    assert(math.abs(quotePair.get._3 - 2.0 / 3.0) < 1e-5)
    // and it is the ONLY pair: filler docs share no chunks
    assert(streamed.length === 1)

    // REPLAY batch 1 through the same sink body (checkpoint recovery after
    // a crash between sink write and offset commit): overwrite-by-batch_id
    // makes it a no-op for the end state
    sinkBody(b1.toDF(), 0L)
    assert(endState() == batchAnswer,
      "replayed batch must not change the end-state containment report")
  }
}
