package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

/** The funnel family (q135) composed with the continuous-ingest core.
  * The decomposition is different from the dedup/graph families: a user's
  * funnel level is a pure function of their OWN accumulated events, but
  * it is NOT monotone per batch — a later batch can deepen a funnel
  * (click arrives after the view) or RESET its anchor (an EARLIER view
  * arrives late, re-anchoring the 24 h window). So the sound incremental
  * rule is: land raw events idempotently per batch, recompute the report
  * over the accumulated store — and the spec plants both the deepening
  * and the late-anchor case to prove recomputation (not incremental
  * max-keeping) is what equals the batch answer. */
class StreamingFunnelSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  // u1: view then click in batch 1 (level 2), purchase arrives in batch 2
  //     → level 3 (cross-batch deepening)
  // u2: click at 02:00 in batch 1 (level 0 — no view yet); batch 2
  //     delivers a LATE view at 01:00 → click is after the anchor and in
  //     window → level 2 (late anchor; naive "keep the max level" would
  //     also say 2 here, so u3 is the discriminating case)
  // u3: view at 10:00 + click at 11:00 in batch 1 (level 2); batch 2
  //     delivers a late EARLIER view at 09:00 → anchor moves to 09:00,
  //     click at 11:00 still within 24 h → level stays 2, but the anchor
  //     change is visible through u4
  // u4: view at 05:00 in batch 1, click 30h later in batch 1 (level 1 —
  //     out of window); batch 2 delivers an earlier view at 04:00 —
  //     still out of window, level stays 1 (anchor reset cannot invent
  //     conversions)
  private val b1 = Seq(
    FunnelEvent(1L, ts(1), "view"), FunnelEvent(1L, ts(2), "click"),
    FunnelEvent(2L, ts(2), "click"),
    FunnelEvent(3L, ts(10), "view"), FunnelEvent(3L, ts(11), "click"),
    FunnelEvent(4L, ts(5), "view"),
    FunnelEvent(4L, Timestamp.valueOf("2024-01-02 11:00:00"), "click"))
  private val b2 = Seq(
    FunnelEvent(1L, ts(3), "purchase"),
    FunnelEvent(2L, ts(1), "view"),
    FunnelEvent(3L, ts(9), "view"),
    FunnelEvent(4L, ts(4), "view"))

  private def levels(ev: DataFrame): Map[Long, Int] =
    Streamingish.windowFunnel(ev).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("incremental funnel: recompute over the accumulated store equals batch") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-funnel").toString
    val store = s"$root/events"

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[FunnelEvent](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def storeDF = s.read.parquet(store).select("user_id", "ts", "event_type")

    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val l1 = levels(storeDF)
      assert(l1 == Map(1L -> 2, 2L -> 0, 3L -> 2, 4L -> 1), s"after batch 1: $l1")

      mem.addData(b2: _*); q.processAllAvailable()
      val l2 = levels(storeDF)
      val batchAnswer = levels((b1 ++ b2).toDF())
      assert(l2 == batchAnswer, s"stream $l2 vs batch $batchAnswer")
      // cross-batch deepening, late anchor creating a conversion, and a
      // late anchor that must NOT invent one
      assert(l2 == Map(1L -> 3, 2L -> 2, 3L -> 2, 4L -> 1), s"end state: $l2")

      // replay batch 0: idempotent store → report unchanged
      sinkBody(b1.toDF(), 0L)
      assert(levels(storeDF) == batchAnswer)
    } finally q.stop()
  }
}
