package graft.ops

import Loops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class DsirDoc(doc_id: Long, lang: String, text: String)

/** q154's DSIR importance weights composed with continuous ingest — the
  * pinned-model pattern (same shape as StreamingKMeansSpec's
  * recluster-periodically/assign-continuously): arrivals score against
  * the LAST LM snapshot immediately (cheap: one broadcast-joined pass
  * over the batch), and the LM itself refreshes periodically from the
  * accumulated idempotent store. The two halves the spec pins:
  *
  *  1. scoring is correct against a PINNED model even when arrivals
  *     carry vocabulary the snapshot has never seen (the LEFT join +
  *     add-1 smoothing floor, asserted against a hand-computed weight);
  *  2. the refresh is exactly the batch model: `dsirModel` over the
  *     accumulated store ≡ the model built from all documents at once
  *     (pure aggregates — order/batching independence), so scores after
  *     refresh equal the batch q154 answer on the same docs.
  *
  * A replayed batch id is a no-op (overwrite into batch_id partition). */
class StreamingDsirSpec extends SparkSpec {

  private val b1 = Seq(
    DsirDoc(1L, "en", "the cat sat on the mat"),
    DsirDoc(2L, "en", "the dog sat on the log"),
    DsirDoc(3L, "de", "der hund sass auf dem baum"))
  private val b2 = Seq(
    DsirDoc(4L, "fr", "le chat sat on the mat"), // mixes pinned + NEW vocab
    DsirDoc(5L, "de", "der baum und der hund"))

  private def scoresOf(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getAs[Double]("dsir_logw")).toMap

  test("pinned-model scoring + periodic refresh equals the batch answer") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-dsir").toString
    val store = s"$root/words"

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      PipelineOps.dsirWordFrame(batch)
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[DsirDoc](s)
    val query = mem.toDF().writeStream
      .foreachBatch(sinkBody _)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      mem.addData(b1: _*)
      query.processAllAvailable()

      // model pinned from the batch-1 store
      val acc1 = s.read.parquet(store)
        .select(col("doc_id"), col("lang"), col("word"))
      val (ws1, tot1) = PipelineOps.dsirModel(acc1)
      val pinned = (ws1.pin(), tot1.pin())

      mem.addData(b2: _*)
      query.processAllAvailable()

      // 1. arrivals score against the PINNED snapshot — including words
      //    ("le", "chat", "und") the snapshot never saw
      val w2 = PipelineOps.dsirWordFrame(b2.toDF())
      val got = scoresOf(PipelineOps.dsirScores(w2, pinned._1, pinned._2))
      // hand-computed for doc 4 against the b1 model:
      // b1: ns=18, nt=12, v=13; counts: the=4(ct 4), sat=2(2), on=2(2), mat=1(1)
      val (ns, nt, v) = (18.0, 12.0, 13.0)
      def lw(ct: Long, cs: Long): Double =
        math.log((ct + 1) / (nt + v)) - math.log((cs + 1) / (ns + v))
      val doc4Words = Seq(("le", 0L, 0L), ("chat", 0L, 0L), ("sat", 2L, 2L),
        ("on", 2L, 2L), ("the", 4L, 4L), ("mat", 1L, 1L))
      val expected4 = BigDecimal(doc4Words.sortBy(_._1)
          .map { case (_, cs, ct) => lw(ct, cs) }.sum / 6.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(4L) - expected4) < 2e-6,
        s"pinned-model score ${got(4L)} != hand-computed $expected4")
      assert(got.keySet == Set(4L, 5L))

      // 2. refresh over the accumulated store ≡ batch model over all docs
      val accAll = s.read.parquet(store)
        .select(col("doc_id"), col("lang"), col("word"))
      val (wsR, totR) = PipelineOps.dsirModel(accAll)
      val refreshed = scoresOf(
        PipelineOps.dsirScores(accAll, wsR, totR))
      val batchW = PipelineOps.dsirWordFrame((b1 ++ b2).toDF())
      val (wsB, totB) = PipelineOps.dsirModel(batchW)
      val batch = scoresOf(PipelineOps.dsirScores(batchW, wsB, totB))
      assert(refreshed == batch,
        s"refreshed-model scores diverge from batch: $refreshed vs $batch")

      // 3. replayed batch id is a no-op for the store (count captured
      // BEFORE the overwrite — the old frame's file listing goes stale)
      val before = accAll.count()
      sinkBody(b2.toDF(), 1L)
      val again = s.read.parquet(store).count()
      assert(again == before, "replayed batch changed the store")
    } finally query.stop()
  }
}
