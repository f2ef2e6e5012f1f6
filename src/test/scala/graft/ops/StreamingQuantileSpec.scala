package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class QuantEvent(etype: String, value: Double)

/** q166's streaming composition — and the honest contrast to q181:
  * Spark's percentile_approx (Greenwald–Khanna) partial states are NOT
  * exposed as a mergeable column type the way HLL sketches are, so the
  * streaming shape is the StreamingDsirSpec refresh idiom: per-batch raw
  * rows land under the batch_id-keyed idempotent store, and a refresh
  * RE-AGGREGATES the accumulated store (one distributed pass — the
  * sketch's partial merge still happens inside that aggregation, just
  * per refresh instead of incrementally across batches). The refresh
  * answer must equal the batch answer bit-for-bit (same deterministic
  * sketch over the same multiset), and a replayed batch must change
  * nothing. */
class StreamingQuantileSpec extends SparkSpec {

  test("per-refresh quantile sketch over the accumulated store equals the batch answer across replay") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-quant").toString
    val raw = s"$root/raw"

    def batchRows(seed: Int, n: Int): Seq[QuantEvent] =
      (0 until n).map { i =>
        val t = Seq("click", "view", "purchase")((i + seed) % 3)
        QuantEvent(t, ((i * 37 + seed * 101) % 1000) / 10.0)
      }
    val b1 = batchRows(0, 400)
    val b2 = batchRows(1, 400)
    val b3 = batchRows(2, 400)

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[QuantEvent](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val probs = array((1 to 9).map(i => lit(i / 10.0)): _*)
    def deciles(df: DataFrame): Seq[(String, Seq[Double])] =
      df.groupBy(col("etype"))
        .agg(percentile_approx(col("value"), probs, lit(10000)).as("qs"))
        .orderBy(col("etype"))
        .collect().map(r => (r.getString(0), r.getSeq[Double](1))).toSeq

    val streamed = deciles(s.read.parquet(raw).select("etype", "value"))
    val batch = deciles((b1 ++ b2 ++ b3).toDF("etype", "value"))
    assert(streamed == batch,
      s"refresh over the accumulated store diverged from the batch sketch:\n$streamed\nvs\n$batch")

    // replay batch 1 (crash between sink write and offset commit)
    sinkBody(b2.toDF("etype", "value"), 1L)
    val replayed = deciles(s.read.parquet(raw).select("etype", "value"))
    assert(replayed == batch, "replayed batch changed the refresh answer")
  }
}
