package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues}
import org.apache.spark.sql.Encoders
import graft.SparkSpec

/** True-streaming twins of the batch-verified Streamingish operators:
  * event-time tumbling windows with watermark, streaming dedup, and
  * arbitrary per-key state via flatMapGroupsWithState (SURVEY.md §2.2
  * streaming category). */
// top-level so Catalyst can build an Encoder (inner classes lack a
// reachable outer scope for newInstance)
case class Ev(ts: Timestamp, user_id: Long, value: Double)

/** transformWithState processor: running per-user max of `value`, emitting
  * one (user, max) row per batch the user appears in. */
class MaxValueProcessor extends StatefulProcessor[Long, Ev, (Long, Double)] {
  @transient private var maxState: org.apache.spark.sql.streaming.ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxState = getHandle.getValueState[Double](
      "max", Encoders.scalaDouble, org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[(Long, Double)] = {
    val prev = if (maxState.exists()) maxState.get() else Double.MinValue
    val mx = rows.foldLeft(prev)((m, e) => math.max(m, e.value))
    maxState.update(mx)
    Iterator((key, mx))
  }
}

/** transformWithState processor with event-time TIMERS: counts events per
  * user and registers an inactivity timer at last-event-time + 10 min; when
  * the watermark passes it, the session total is emitted and state cleared
  * — the timer/TTL surface of the Spark 4 arbitrary-state API (the part
  * q36's declarative session_window cannot express: custom on-expiry
  * output and explicit state lifecycle). */
class SessionCountProcessor extends StatefulProcessor[Long, Ev, (Long, Long)] {
  import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
  @transient private var cnt: ValueState[Long] = _
  @transient private var timerAt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    timerAt = getHandle.getValueState[Long]("timerAt", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    var n = 0L
    var maxTs = 0L
    rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
    cnt.update((if (cnt.exists()) cnt.get() else 0L) + n)
    // keep exactly one pending inactivity timer per key
    if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
    val at = maxTs + 10 * 60 * 1000
    getHandle.registerTimer(at)
    timerAt.update(at)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[(Long, Long)] = {
    val total = if (cnt.exists()) cnt.get() else 0L
    cnt.clear()
    timerAt.clear()
    Iterator((key, total))
  }
}

/** transformWithState processor exercising the two composite state types:
  * ListState (a bounded recent-values window per key — the "last N
  * readings" pattern) and MapState (per-key sub-aggregation without
  * widening the grouping key — value-bucket counts here). Emits one
  * (user, sum of last 3 values, distinct buckets seen) row per batch. */
class RecentAndBucketsProcessor extends StatefulProcessor[Long, Ev, (Long, Double, Long)] {
  import org.apache.spark.sql.streaming.{ListState, MapState, TTLConfig}
  @transient private var recent: ListState[Double] = _
  @transient private var buckets: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[Double](
      "recent", Encoders.scalaDouble, TTLConfig.NONE)
    buckets = getHandle.getMapState[Long, Long](
      "buckets", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[(Long, Double, Long)] = {
    rows.foreach { e =>
      recent.appendValue(e.value)
      val b = math.floor(e.value).toLong
      buckets.updateValue(b, (if (buckets.containsKey(b)) buckets.getValue(b) else 0L) + 1L)
    }
    // trim the list to the last 3 — ListState has no suffix op, so the
    // trim is read-modify-put (bounded: at most 3 + batch-size elements)
    val all = recent.get().toArray
    val last3 = all.takeRight(3)
    recent.put(last3)
    Iterator((key, last3.sum, buckets.keys().size.toLong))
  }
}

// NOTE on state TTL: `TTLConfig(Duration)` (processing-time expiry for
// keys that go quiet forever) requires TimeMode.ProcessingTime, in which
// the engine schedules micro-batches continuously to advance the clock —
// `processAllAvailable` never settles, so it cannot be exercised in this
// deterministic test harness. The timer test below covers the explicit
// state-lifecycle surface (register/delete/expire) with event time, which
// subsumes the TTL mechanism for testable purposes.
class StreamingOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("event-time tumbling window with watermark (streaming mode)") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[Ev](s)
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start").as("w"), col("n"), col("v"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("tumble_out").start()
    try {
      mem.addData(Ev(ts(1), 1, 1.0), Ev(ts(2), 2, 2.0), Ev(ts(7), 1, 3.0))
      q.processAllAvailable()
      // advance watermark past the first windows
      mem.addData(Ev(ts(30), 1, 9.0))
      q.processAllAvailable()
      val rows = s.table("tumble_out").orderBy("w").collect()
      assert(rows.length == 2) // 10:00 and 10:05 windows closed and emitted
      assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 3.0)
      assert(rows(1).getLong(1) == 1 && rows(1).getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("streaming dedup with dropDuplicates") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[Ev](s)
    val q = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(Ev(ts(1), 7, 1.0), Ev(ts(2), 7, 2.0), Ev(ts(3), 8, 3.0))
      q.processAllAvailable()
      mem.addData(Ev(ts(4), 7, 4.0), Ev(ts(5), 9, 5.0))
      q.processAllAvailable()
      val users = s.table("dedup_out").select("user_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(users == Seq(7L, 8L, 9L)) // each key kept exactly once
    } finally q.stop()
  }

  test("transformWithState: per-user running max with ValueState (Spark 4 API)") {
    val s = spark
    import s.implicits._
    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store provider
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev](s)
    val out = mem.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new MaxValueProcessor, TimeMode.None(), OutputMode.Append())
    val q = out.toDF("user_id", "max_value")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("tws_out").start()
    try {
      mem.addData(Ev(ts(1), 1, 5.0), Ev(ts(2), 1, 3.0), Ev(ts(3), 2, 7.0))
      q.processAllAvailable()
      mem.addData(Ev(ts(4), 1, 9.0), Ev(ts(5), 2, 1.0))
      q.processAllAvailable()
      val rows = s.table("tws_out").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows.contains((1L, 5.0)) && rows.contains((2L, 7.0))) // batch 1
      assert(rows.contains((1L, 9.0)) && rows.contains((2L, 7.0))) // batch 2, state carried
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState timers: inactivity timeout emits session totals") {
    val s = spark
    import s.implicits._
    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev](s)
    val out = mem.toDS()
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionCountProcessor, TimeMode.EventTime(), OutputMode.Append())
    val q = out.toDF("user_id", "session_n")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("timer_out").start()
    try {
      // user 1: two events, then silence → timer at 10:02 + 10 min
      mem.addData(Ev(ts(1), 1, 1.0), Ev(ts(2), 1, 2.0))
      q.processAllAvailable()
      // advance the watermark past the timer (wm updates at end of batch,
      // timers fire in the batch AFTER the advance)
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 11:00:00"), 9, 0))
      q.processAllAvailable()
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 11:05:00"), 9, 0))
      q.processAllAvailable()
      val rows = s.table("timer_out").where("user_id = 1").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 2L))) // one emission with the session total
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState: ListState + MapState composite state types") {
    val s = spark
    import s.implicits._
    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev](s)
    val out = mem.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new RecentAndBucketsProcessor, TimeMode.None(), OutputMode.Append())
    val q = out.toDF("user_id", "last3_sum", "n_buckets")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("liststate_out").start()
    try {
      mem.addData(Ev(ts(1), 1, 1.5), Ev(ts(2), 1, 2.5), Ev(ts(3), 1, 3.5), Ev(ts(4), 1, 4.5))
      q.processAllAvailable()
      // batch 1: last 3 of [1.5 2.5 3.5 4.5] sums 10.5; buckets {1,2,3,4}
      mem.addData(Ev(ts(5), 1, 1.25))
      q.processAllAvailable()
      // batch 2: ListState carried + trimmed → last 3 = [3.5 4.5 1.25];
      // bucket 1 already present, so the MapState count stays 4 keys
      val rows = s.table("liststate_out").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(rows.contains((1L, 10.5, 4L)), s"batch-1 row missing: $rows")
      assert(rows.contains((1L, 9.25, 4L)), s"batch-2 row missing: $rows")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session window in streaming mode (same expr as batch q36)") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[Ev](s)
    val agg = mem.toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("st"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_out").start()
    try {
      // two bursts 20 min apart → two sessions for user 1; the watermark
      // computed at the end of batch N applies in batch N+1, so later
      // batches push it past both session ends before emission
      mem.addData(Ev(ts(1), 1, 0), Ev(ts(5), 1, 0), Ev(ts(25), 1, 0))
      q.processAllAvailable()
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 11:30:00"), 9, 0))
      q.processAllAvailable()
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 11:31:00"), 9, 0))
      q.processAllAvailable()
      val rows = s.table("sess_out").where("user_id = 1").orderBy("st").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, 2L), (1L, 1L))) // sizes 2 then 1
    } finally q.stop()
  }

  test("session window with a DYNAMIC per-event gap (expression gap, Spark 3.2+)") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[Ev](s)
    // gap depends on the row: v = 1 → 30-minute gap, else 5-minute — the
    // "heavy users idle longer" policy a fixed-gap session can't express
    val gap = when(col("value") === 1.0, lit("30 minutes"))
      .otherwise(lit("5 minutes"))
    val agg = mem.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("st"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dynsess_out").start()
    try {
      // user 1 (v=1, 30-min gap): events 20 min apart MERGE into one session
      // user 2 (v=0, 5-min gap): the same spacing SPLITS into two sessions
      mem.addData(Ev(ts(0), 1, 1), Ev(ts(20), 1, 1),
        Ev(ts(0), 2, 0), Ev(ts(20), 2, 0))
      q.processAllAvailable()
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 14:00:00"), 9, 0))
      q.processAllAvailable()
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 14:01:00"), 9, 0))
      q.processAllAvailable()
      val rows = s.table("dynsess_out").where("user_id IN (1, 2)")
        .orderBy("user_id", "st").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, 2L), (2L, 1L), (2L, 1L)),
        s"dynamic gap sessions wrong: ${rows.toSeq}")
    } finally q.stop()
  }

  test("stream-static join: enrich a stream against a batch dimension") {
    val s = spark
    import s.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[Ev](s)
    val q = mem.toDF()
      .join(dim, Seq("user_id"), "left")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enrich_out").start()
    try {
      mem.addData(Ev(ts(1), 1, 1.0), Ev(ts(2), 2, 2.0), Ev(ts(3), 9, 3.0))
      q.processAllAvailable()
      val tiers = s.table("enrich_out").orderBy("user_id")
        .collect().map(r => (r.getLong(0), Option(r.getString(3)).orNull))
      assert(tiers.toSeq == Seq((1L, "gold"), (2L, "silver"), (9L, null)))
    } finally q.stop()
  }

  test("stream-stream join with event-time bounds") {
    val s = spark
    import s.implicits._
    val clicks = MemoryStream[Ev](s)
    val buys = MemoryStream[Ev](s)
    val c = clicks.toDF().select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val b = buys.toDF().select(col("user_id").as("b_user"), col("ts").as("buy_ts"))
      .withWatermark("buy_ts", "30 minutes")
    // buy attributed to a click by the same user within the previous 10 min
    val joined = c.join(b,
      col("user_id") === col("b_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") < col("click_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_out").start()
    try {
      clicks.addData(Ev(ts(1), 1, 0), Ev(ts(2), 2, 0))
      buys.addData(Ev(ts(5), 1, 0), Ev(ts(40), 2, 0)) // user 2 buys too late
      q.processAllAvailable()
      val rows = s.table("ssj_out").select("user_id").collect().map(_.getLong(0))
      assert(rows.toSeq == Seq(1L)) // only user 1's buy is within the window
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps one row per key per watermark span") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[Ev](s)
    val q = mem.toDF()
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("user_id")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ddww_out").start()
    try {
      mem.addData(Ev(ts(1), 5, 1.0), Ev(ts(2), 5, 2.0)) // dup within span
      q.processAllAvailable()
      // push the watermark far past user 5's span, then the key re-admits
      mem.addData(Ev(ts(50), 6, 3.0))
      q.processAllAvailable()
      mem.addData(Ev(ts(55), 5, 4.0))
      q.processAllAvailable()
      val vals = s.table("ddww_out").where("user_id = 5")
        .collect().map(_.getDouble(2)).sorted.toSeq
      assert(vals == Seq(1.0, 4.0)) // first occurrence per span only
    } finally q.stop()
  }

  test("arbitrary state: per-user running count via flatMapGroupsWithState") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[Ev](s)
    val counted = mem.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + evs.size
          state.update(next)
          Iterator((user, next))
      }
    val q = counted.toDF("user_id", "running_n")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("state_out").start()
    try {
      mem.addData(Ev(ts(1), 1, 1.0), Ev(ts(2), 1, 1.0), Ev(ts(3), 2, 1.0))
      q.processAllAvailable()
      mem.addData(Ev(ts(4), 1, 1.0))
      q.processAllAvailable()
      val byBatch = s.table("state_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      // batch 1: user1 → 2, user2 → 1; batch 2: user1 → 3 (state carried)
      assert(byBatch.contains((1L, 2L)) && byBatch.contains((2L, 1L)))
      assert(byBatch.contains((1L, 3L)))
    } finally q.stop()
  }
}
