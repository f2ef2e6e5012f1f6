package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class TimedEvent(event_id: Long, ts: java.sql.Timestamp)

/** q152's interval join as a CONTINUOUS query. Structured Streaming
  * refuses a stream-stream join without an equality predicate (state
  * would be all-pairs) — and the fix is exactly q152's batch shape: the
  * error side explodes to its 3 candidate time buckets (b−1, b, b+1),
  * the click side keys on its own bucket, and the join is bucket
  * equality + the exact |Δts| ≤ 120 s residual. The bucketization that
  * de-cartesians the batch plan is what makes the streaming join LEGAL;
  * the watermarks + the range condition let the symmetric hash join
  * evict state past max-event-time − watermark − range instead of
  * growing forever. The spec proves the streamed pairs equal the batch
  * theta join over the same data across out-of-order batches, and pins
  * the StreamingSymmetricHashJoin plan. */
class StreamingIntervalJoinSpec extends SparkSpec {

  private val W = 120000000L // 120 s bucket width in microseconds

  private def t(min: Int, sec: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  /** error stream → (eid, ets, bkt) probes over the 3 candidate buckets;
    * click stream → (cid, cts, bkt) keyed on its own bucket. */
  private def probes(errors: DataFrame): DataFrame =
    errors.select(col("event_id").as("eid"), col("ts").as("ets"))
      .withWatermark("ets", "10 minutes")
      .select(col("eid"), col("ets"), explode(expr(
        s"""array(unix_micros(ets) DIV $W - 1, unix_micros(ets) DIV $W,
           |      unix_micros(ets) DIV $W + 1)""".stripMargin)).as("bkt"))

  private def keyed(clicks: DataFrame): DataFrame =
    clicks.select(col("event_id").as("cid"), col("ts").as("cts"))
      .withWatermark("cts", "10 minutes")
      .withColumn("bkt", expr(s"unix_micros(cts) DIV $W"))

  private def ranged(e: DataFrame, c: DataFrame): DataFrame =
    e.join(c, e("bkt") === c("bkt") &&
      expr("cts BETWEEN ets - INTERVAL 120 SECONDS AND ets + INTERVAL 120 SECONDS"))

  test("watermarked bucket-keyed stream-stream range join equals the batch theta join") {
    val s = spark
    import s.implicits._
    val errors = MemoryStream[TimedEvent](s)
    val clicks = MemoryStream[TimedEvent](s)
    val joined = ranged(probes(errors.toDF()), keyed(clicks.toDF()))
    val query = joined.writeStream.format("memory")
      .queryName("interval_join_sink").outputMode("append").start()
    try {
      // batch 1: e1 with one click inside (+60 s) and one outside (+200 s)
      errors.addData(TimedEvent(1L, t(10)))
      clicks.addData(TimedEvent(101L, t(11)), TimedEvent(102L, t(13, 20)))
      query.processAllAvailable()
      // batch 2 arrives out of order: a click BEFORE e1 (−90 s, matches)
      // and a second error matching the batch-1 clicks
      clicks.addData(TimedEvent(103L, t(8, 30)))
      errors.addData(TimedEvent(2L, t(12)))
      query.processAllAvailable()

      val streamed = s.table("interval_join_sink")
        .select(col("eid"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val allE = Seq(1L -> t(10), 2L -> t(12))
      val allC = Seq(101L -> t(11), 102L -> t(13, 20), 103L -> t(8, 30))
      val expected = (for {
        (eid, ets) <- allE
        (cid, cts) <- allC
        if math.abs(cts.getTime - ets.getTime) <= 120000L
      } yield (eid, cid)).toSet
      assert(streamed == expected, s"streamed $streamed != batch $expected")
      assert(expected == Set((1L, 101L), (2L, 101L), (2L, 102L), (1L, 103L)),
        "test fixture drifted — expected pairs changed")
    } finally query.stop()
  }

  test("e2e: the join over Pipeline-landed tables survives a dead-letter replay") {
    // VERDICT r8 task 6: the same bucket-keyed watermarked join, but the
    // sources are FILE STREAMS over the ingest pipeline's idempotent
    // parquet store — errors and clicks land through Pipeline.start, a
    // transiently-failed click+error batch sits in the dead-letter store,
    // and Replay lands it mid-stream under its replay partition. The
    // running join must pick the late files up and converge to the batch
    // theta-join answer over the full landed store. Late data stays
    // inside the 10-minute watermark, so nothing is (correctly) evicted.
    val s = spark
    import s.implicits._
    import graft.ingest.{EngineConfig, Pipeline, Replay, TopicConfig}
    import graft.functions.SnappyDecode
    val root = java.nio.file.Files.createTempDirectory("graft-ij-e2e").toString
    val tcErr = TopicConfig("t.err", "err", "event_id\tInt64\t\t\nts_us\tInt64\t\t")
    val tcClk = TopicConfig("t.clk", "clk", "event_id\tInt64\t\t\nts_us\tInt64\t\t")
    val cfg = EngineConfig(
      topics = Seq(tcErr, tcClk),
      tableRoot = s"$root/tables",
      deadLetterRoot = s"$root/dead",
      checkpointRoot = s"$root/ckpt",
      metricsPort = 0)
    def payload(topic: String, eid: Long, ts: java.sql.Timestamp) =
      (topic, SnappyDecode.compress(
        s"""{"event_id": $eid, "ts_us": ${ts.getTime * 1000L}}""".getBytes("UTF-8")))

    // live ingest: e1/e2 and c101 land; replay comes later
    val mem = MemoryStream[(String, Array[Byte])](s)
    val (ingest, _) = Pipeline.start(s, cfg, mem.toDF().toDF("topic", "value"))
    try {
      mem.addData(payload("t.err", 1L, t(10)), payload("t.err", 2L, t(12)),
        payload("t.clk", 101L, t(11)))
      ingest.processAllAvailable()
    } finally ingest.stop()

    // transiently-failed late batch parked per-table in the dead-letter
    // store: a click 90 s BEFORE e1, and an error matching c101
    Seq(payload("t.clk", 103L, t(8, 30)))
      .toDF("topic", "value")
      .write.mode("append").parquet(s"$root/dead/clk/batch_id=manual")
    Seq(payload("t.err", 3L, t(11, 30)))
      .toDF("topic", "value")
      .write.mode("append").parquet(s"$root/dead/err/batch_id=manual")

    def landed(table: String): DataFrame = {
      val dir = s"$root/tables/$table"
      // batch_id must be declared STRING: live batches are numeric but
      // Replay lands under batch_id=replay-N, and a stream that inferred
      // INT from the first files would die at the replay partition
      val sch = org.apache.spark.sql.types.StructType(
        s.read.parquet(dir).schema.map(f =>
          if (f.name == "batch_id")
            f.copy(dataType = org.apache.spark.sql.types.StringType)
          else f))
      s.readStream.schema(sch).parquet(dir)
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"))
    }
    val joined = ranged(probes(landed("err")), keyed(landed("clk")))
    val query = joined.writeStream.format("memory")
      .queryName("interval_join_e2e").outputMode("append").start()
    try {
      query.processAllAvailable()
      val first = s.table("interval_join_e2e").select(col("eid"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(first == Set((1L, 101L), (2L, 101L)), s"pre-replay pairs: $first")

      // replay the dead letters → idempotent landing under batch_id=replay-*
      Replay.replayAll(s, cfg)
      query.processAllAvailable()
      val streamed = s.table("interval_join_e2e").select(col("eid"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // batch q152 answer over the full landed store
      def full(table: String) = s.read.parquet(s"$root/tables/$table")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"))
      val expected = full("err").as("e").join(full("clk").as("c"),
          expr("c.ts BETWEEN e.ts - INTERVAL 120 SECONDS AND e.ts + INTERVAL 120 SECONDS"))
        .select(col("e.event_id"), col("c.event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == expected, s"streamed $streamed != batch $expected")
      assert(expected == Set((1L, 101L), (2L, 101L), (1L, 103L), (3L, 101L)),
        "fixture drifted — expected post-replay pairs changed")
    } finally query.stop()
  }

  test("the plan is a StreamingSymmetricHashJoin keyed on the bucket") {
    val s = spark
    import s.implicits._
    val errors = MemoryStream[TimedEvent](s)
    val clicks = MemoryStream[TimedEvent](s)
    val joined = ranged(probes(errors.toDF()), keyed(clicks.toDF()))
    val query = joined.writeStream.format("memory")
      .queryName("interval_join_plan").outputMode("append").start()
    try {
      errors.addData(TimedEvent(1L, t(10)))
      clicks.addData(TimedEvent(101L, t(11)))
      query.processAllAvailable()
      import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
      val exec = query.asInstanceOf[StreamingQueryWrapper].streamingQuery
      val plan = exec.lastExecution.executedPlan.toString
      assert(plan.contains("StreamingSymmetricHashJoin"),
        s"range join did not plan as a symmetric hash join:\n$plan")
      assert(plan.contains("bkt"), s"join state not keyed on the bucket:\n$plan")
    } finally query.stop()
  }
}
