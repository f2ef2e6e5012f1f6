package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class WauEvent(user_id: Long, day_idx: Long)

/** q266's streaming composition: rolling WAU is a daily-refresh product
  * metric, so the natural shape is the accumulated-store refresh idiom —
  * per-batch (user, day) activity lands under the batch_id-keyed
  * idempotent store, each refresh recomputes the exact rolling window
  * over everything landed. Exactness survives both accretion and replay
  * because the metric is a deterministic function of the DISTINCT pair
  * set (rollingWau dedups internally): late-arriving days update past
  * windows correctly on the next refresh — the property sketch unions
  * cannot offer. */
class StreamingWauSpec extends SparkSpec {

  test("per-refresh rolling WAU over the accumulated store equals batch across replay") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-wau").toString
    val raw = s"$root/raw"

    def batchRows(seed: Int, n: Int): Seq[WauEvent] =
      (0 until n).map { i =>
        WauEvent(((i * 13 + seed * 7) % 40).toLong, ((i + seed * 3) % 21).toLong)
      }
    val b1 = batchRows(0, 300)
    val b2 = batchRows(1, 300)
    val b3 = batchRows(2, 300) // overlaps earlier days: late arrivals

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[WauEvent](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def wau(df: DataFrame) = TimeSeries.rollingWau(df).collect().toSeq

    val streamed = wau(s.read.parquet(raw).select("user_id", "day_idx"))
    val batch = wau((b1 ++ b2 ++ b3).toDF())
    assert(streamed == batch,
      s"refresh over the accumulated store diverged from batch:\n$streamed\nvs\n$batch")
    assert(batch.nonEmpty && batch.forall(r => r.getLong(2) >= r.getLong(1)),
      "WAU must dominate DAU on every day")

    // replay batch 1 (crash between sink write and offset commit)
    sinkBody(b2.toDF(), 1L)
    val replayed = wau(s.read.parquet(raw).select("user_id", "day_idx"))
    assert(replayed == batch, "replayed batch changed the refresh answer")
  }
}
