package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class VidDoc(doc_id: Long, text: String)

/** The video family (q243/q244) composed with the continuous-ingest core.
  * Simplest decomposition in the multimodal set: a clip's frame hashes —
  * and therefore its shot report — depend ONLY on its own payload, so the
  * per-batch work is map-side frame hashing landed into a batch_id-keyed
  * idempotent store, and the incremental rule is pure union: shots(new
  * docs) ∪ carried report. The spec asserts per-batch-union == recompute-
  * over-store == the batch answer after every arrival, and that replaying
  * a batch id (the at-least-once delivery case) is a no-op. */
class StreamingVideoSpec extends SparkSpec {

  private val b1 = Seq(
    VidDoc(1L, "the quick brown fox jumps over the lazy dog again and again"),
    VidDoc(2L, ("alpha beta gamma delta " * 12) + ("zzz qqq xxx www vvv " * 12)))
  private val b2 = Seq(
    VidDoc(3L, "completely different content with many unusual words inside"),
    VidDoc(4L, "yet another unrelated document body for the second arrival"))

  private type Shots = Map[Long, (Long, Long, Long)]

  private def shotsOf(frames: DataFrame): Shots =
    VideoOps.shotsFrom(frames).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("incremental video shots: per-doc union equals recompute over the store") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-vid").toString
    val store = s"$root/frames"

    // the SAME container+codec path the batch queries run
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      VideoOps.frameHashesFrom(batch)
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[VidDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def storeDF = s.read.parquet(store)
      .select("doc_id", "frame_idx", "dhash_hi", "dhash_lo")

    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val r1 = shotsOf(storeDF)
      assert(r1.keySet === Set(1L, 2L))

      mem.addData(b2: _*); q.processAllAvailable()
      // incremental rule: shots of the NEW docs only, union the carried
      // report — per-doc independence makes this exact
      val inc = shotsOf(storeDF.filter(col("doc_id").isin(3L, 4L)))
      val recompute = shotsOf(storeDF)
      assert(r1 ++ inc === recompute)
      assert(recompute.keySet === Set(1L, 2L, 3L, 4L))

      // streaming equals batch: the same docs through the batch path
      val batchAnswer = shotsOf(VideoOps.frameHashesFrom((b1 ++ b2).toDF()))
      assert(recompute === batchAnswer)

      // at-least-once replay: re-landing batch 1's content under its
      // batch id overwrites idempotently — the report is unchanged
      VideoOps.frameHashesFrom(b1.toDF())
        .write.mode("overwrite").parquet(s"$store/batch_id=0")
      assert(shotsOf(storeDF) === recompute)
    } finally q.stop()
  }
}
