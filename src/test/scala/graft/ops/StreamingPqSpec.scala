package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class PqVec(vec_id: Long, embedding: Seq[Float])

/** PQ composes with continuous ingest the same way MinHash does
  * (StreamingMinHashSpec): a vector's codes depend ONLY on its own
  * components and the PINNED codebook, so per-micro-batch encoding into a
  * batch_id-keyed idempotent store is exactly the batch-global encode for
  * the same vectors — the accumulated code store then serves ADC search
  * with no re-encoding of history. (Codebook changes are the rebuild
  * case: like StreamingKMeansSpec's recluster-periodically idiom, a new
  * codebook re-encodes from the accumulated RAW store — out of scope
  * here; the pinned-codebook regime is the steady state.) Three batches,
  * a replay, and exact equality against the batch encode. */
class StreamingPqSpec extends SparkSpec {

  /** deterministic vector: component i of vec v. */
  private def vec(v: Long): Seq[Float] =
    (0 until 64).map(i => (((v * 31 + i * 17) % 97) / 97.0f) - 0.5f)

  test("per-batch PQ encoding into an idempotent store equals the batch encode; replay no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-pq").toString
    val rawStore = s"$root/raw"

    // the codebook vectors (ids < 64) arrive in batch 1 — the pinned-
    // codebook regime needs them landed before any encode; later batches
    // are pure additions
    val b1 = (0L until 70L).map(v => PqVec(v, vec(v)))
    val b2 = (70L until 85L).map(v => PqVec(v, vec(v)))
    val b3 = (85L until 100L).map(v => PqVec(v, vec(v)))

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$rawStore/batch_id=$batchId")

    val mem = MemoryStream[PqVec](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    // materialize the accumulated store as an embeddings table and run
    // the REAL registered queries against it — per-batch encode equals
    // whole-store encode because codes are per-row against ids < 64
    def asDir(src: DataFrame): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-pq-dir").toString
      src.select(col("vec_id"), col("embedding"),
          pmod(col("vec_id"), lit(20L)).cast("int").as("label"))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val streamedDir = asDir(
      s.read.parquet(rawStore).select(col("vec_id"), col("embedding")).distinct())
    val batchDir = asDir((b1 ++ b2 ++ b3).toDF())

    def codes(dir: String): Seq[(Long, String)] =
      graft.SparkEntry.queries("q292_pq_encode")(s, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val streamed = codes(streamedDir)
    val batch = codes(batchDir)
    assert(streamed.nonEmpty && streamed == batch,
      "accumulated-store PQ codes diverge from the batch encode")

    // incremental property at the row level: encoding ONLY batch 3's
    // vectors (with the same pinned codebook available) yields exactly
    // their rows in the whole-store answer
    val b3dir = asDir(b1.take(64).toDF().unionAll(b3.toDF()))
    val b3codes = codes(b3dir).filter(_._1 >= 85L)
    assert(b3codes == batch.filter(_._1 >= 85L),
      "per-batch encode diverges from the batch-global rows")

    // ADC search over the accumulated store equals search over the batch
    // table (same codes, same LUT)
    val adcStream = graft.SparkEntry.queries("q293_pq_adc_topk")(s, streamedDir)
      .collect().map(_.getLong(0)).toSeq
    val adcBatch = graft.SparkEntry.queries("q293_pq_adc_topk")(s, batchDir)
      .collect().map(_.getLong(0)).toSeq
    assert(adcStream == adcBatch, "ADC over the accumulated store diverged")

    // engine-level replay of batch 2: overwrite-by-batch_id keeps the
    // distinct accumulated store — and therefore the codes — unchanged
    sinkBody(b2.toDF(), 1L)
    val replayed = codes(asDir(
      s.read.parquet(rawStore).select(col("vec_id"), col("embedding")).distinct()))
    assert(replayed == batch, "replayed batch changed the code store")
  }
}
