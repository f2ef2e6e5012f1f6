package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class FunnelDoc(doc_id: Long, text: String)

/** The nightly dedup-funnel report (q283), composed with continuous
  * ingest: each micro-batch lands its per-doc token/fingerprint rows AND
  * its hashed-shingle rows under batch_id-keyed idempotent stores (both
  * are per-doc map-side projections, so per-batch rows equal the
  * batch-global ones — the StreamingMinHashSpec argument), and the
  * refresh re-derives verified pairs → components → the SAME
  * [[TextDedup.funnelReport]] the batch query runs. Planted truths: an
  * exact duplicate and a near-dup pair that SPAN batches must collapse in
  * the end-state report (no single batch sees either), and an
  * engine-level batch replay changes nothing. */
class StreamingDedupFunnelSpec extends SparkSpec {

  private def doc(seed: String, n: Int = 40): String =
    (1 to n).map(i => s"$seed$i").mkString(" ")

  /** near-dup of doc(seed): same words with a handful perturbed. */
  private def nearDoc(seed: String, n: Int = 40): String =
    (1 to n).map(i => if (i % 10 == 0) s"x$i" else s"$seed$i").mkString(" ")

  test("funnel refresh == batch report; cross-batch dups collapse; replay no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-funnel").toString
    val tokStore = s"$root/tok"
    val shStore = s"$root/sh"

    // batch 1: doc 1 (alpha), doc 2 (beta)
    // batch 2: doc 3 = EXACT copy of doc 1 (cross-batch exact dup),
    //          doc 4 (gamma)
    // batch 3: doc 5 = NEAR-dup of beta (cross-batch near-dup), doc 6 (delta)
    val b1 = Seq(FunnelDoc(1L, doc("alpha")), FunnelDoc(2L, doc("beta")))
    val b2 = Seq(FunnelDoc(3L, doc("alpha")), FunnelDoc(4L, doc("gamma")))
    val b3 = Seq(FunnelDoc(5L, nearDoc("beta")), FunnelDoc(6L, doc("delta")))

    def sinkBody(batch: DataFrame, batchId: Long): Unit = {
      batch.select(col("doc_id"),
          size(split(lower(trim(col("text"))), "\\s+")).as("n_words"),
          md5(col("text")).as("fp"))
        .write.mode("overwrite").parquet(s"$tokStore/batch_id=$batchId")
      TextDedup.shingleRowsFor(batch)
        .write.mode("overwrite").parquet(s"$shStore/batch_id=$batchId")
    }

    val mem = MemoryStream[FunnelDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def refresh(): Seq[(Int, Long, Long, Double, Double)] = {
      val tok = s.read.parquet(tokStore)
        .select(col("doc_id"), col("n_words"), col("fp")).distinct()
      val hs = s.read.parquet(shStore)
        .select(col("doc_id"), col("h1").as("h")).distinct()
      val pairs = TextDedup.verifiedPairsFor(hs)
        .select(col("doc_a"), col("doc_b"))
      val comp = TextDedup.clusterComponents(s, pairs)
        .select(col("doc_id").as("cdoc"), col("cluster_id"))
      TextDedup.funnelReport(tok, comp).collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
    }

    def batchReport(docs: Seq[FunnelDoc]): Seq[(Int, Long, Long, Double, Double)] = {
      val df = docs.toDF()
      val tok = df.select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).as("n_words"),
        md5(col("text")).as("fp"))
      val hs = TextDedup.shingleRowsFor(df).select(col("doc_id"), col("h1").as("h"))
      val pairs = TextDedup.verifiedPairsFor(hs).select(col("doc_a"), col("doc_b"))
      val comp = TextDedup.clusterComponents(s, pairs)
        .select(col("doc_id").as("cdoc"), col("cluster_id"))
      TextDedup.funnelReport(tok, comp).collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
    }

    val streamed = refresh()
    val batch = batchReport(b1 ++ b2 ++ b3)
    assert(streamed == batch,
      s"streaming funnel diverges from batch:\n$streamed\nvs\n$batch")

    // the planted collapses: 6 raw docs; exact stage drops doc 3 (= doc 1,
    // batches apart) → 5; near-dup stage drops doc 5 (≈ doc 2, batches
    // apart) → 4. No single batch contains either duplicate pair.
    assert(streamed.find(_._1 == 0).get._2 == 6)
    assert(streamed.find(_._1 == 1).get._2 == 5,
      s"cross-batch exact dup not collapsed: $streamed")
    assert(streamed.find(_._1 == 2).get._2 == 4,
      s"cross-batch near-dup not collapsed: $streamed")

    // replay batch 2 through the same sink body: idempotent overwrite
    sinkBody(b2.toDF(), 1L)
    assert(refresh() == batch, "replayed batch changed the funnel report")
  }
}
