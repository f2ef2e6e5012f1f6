package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class LayoutRow(ck: Long, od: java.sql.Date)

/** Streaming layout maintenance (VERDICT r15 item 3): arriving
  * partitions are re-bucketed incrementally under PINNED curve bounds —
  * per micro-batch, each row gets its z and Hilbert key and the batch's
  * per-bucket envelope rows land in a batch_id-keyed idempotent store
  * (the q326/q331 discipline). Because count/min/max compose
  * associatively, a refresh is one re-aggregation of the tiny envelope
  * store — history is NEVER re-keyed. Pinned here: stream == batch
  * envelopes for both curves after every batch, a drift alarm on a
  * planted hot dimension, a domain alarm on rows beyond the pinned
  * bounds, and replayed batches changing nothing. */
class StreamingLayoutSpec extends SparkSpec {

  private val CkLo = 1L; private val CkHi = 64000L
  private val OdLo = "1995-01-01"; private val OdHi = "1998-12-31"

  private def d(offset: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.parse(OdLo).plusDays(offset.toLong))

  /** deterministic uniform rows over the pinned domain */
  private def uniform(from: Int, until: Int): Seq[LayoutRow] =
    (from until until).map(i => LayoutRow(1L + (i * 7919L) % 64000L, d((i * 103) % 1460)))

  test("stream == batch envelopes per curve; hot-bucket + domain drift alarms; replay no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-layout").toString
    val bounds = LayoutWrite.pinnedBounds(s, CkLo, CkHi, OdLo, OdHi)

    def sinkBody(batch: DataFrame, batchId: Long): Unit = {
      val o = batch.select(col("ck"), col("od"))
      o.write.mode("overwrite").parquet(s"$root/raw/batch_id=$batchId")
      LayoutWrite.envelopes(LayoutWrite.zFrame(o, bounds), "z")
        .write.mode("overwrite").parquet(s"$root/env_z/batch_id=$batchId")
      LayoutWrite.envelopes(LayoutWrite.hilbertFrame(o, bounds), "d")
        .write.mode("overwrite").parquet(s"$root/env_h/batch_id=$batchId")
    }

    val mem = MemoryStream[LayoutRow](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    /** one refresh: re-aggregate the accumulated envelope store */
    def refresh(curve: String): Map[Long, (Long, Long, Long, java.sql.Date, java.sql.Date)] =
      s.read.option("basePath", s"$root/env_$curve").parquet(s"$root/env_$curve")
        .groupBy(col("bucket"))
        .agg(sum(col("n_rows")).as("n_rows"),
          min(col("min_ck")).as("min_ck"), max(col("max_ck")).as("max_ck"),
          min(col("min_od")).as("min_od"), max(col("max_od")).as("max_od"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDate(4), r.getDate(5)))
        .toMap

    /** the batch twin over the union corpus, same pinned bounds */
    def batchTwin(curve: String): Map[Long, (Long, Long, Long, java.sql.Date, java.sql.Date)] = {
      val raw = s.read.option("basePath", s"$root/raw").parquet(s"$root/raw")
        .select(col("ck"), col("od"))
      val keyed = if (curve == "z") LayoutWrite.zFrame(raw, bounds)
        else LayoutWrite.hilbertFrame(raw, bounds)
      LayoutWrite.envelopes(keyed, if (curve == "z") "z" else "d").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDate(4), r.getDate(5)))
        .toMap
    }

    /** (hot-bucket alarm, domain alarm) — both read ONLY the envelope
      * store: hot = a bucket holds > 8× the uniform share; domain = an
      * envelope's ck min/max escapes the pinned bounds (the 16-term
      * interleave masks to 16 lane bits, so out-of-domain rows ALIAS
      * into in-domain bucket ids — the bucket id can never signal
      * drift, the envelope against the pinned bounds can) */
    def alarms(curve: String): (Boolean, Boolean) = {
      val env = refresh(curve)
      val tot = env.values.map(_._1).sum.toDouble
      val hot = env.values.map(_._1).max > 8.0 * tot / 64
      val domain = env.values.exists { case (_, minCk, maxCk, _, _) =>
        minCk < CkLo || maxCk > CkHi
      }
      (hot, domain)
    }

    try {
      mem.addData(uniform(0, 2000): _*)
      q.processAllAvailable()
      mem.addData(uniform(2000, 4000): _*)
      q.processAllAvailable()
      Seq("z", "h").foreach { c =>
        assert(refresh(c) === batchTwin(c), s"$c stream != batch after uniform batches")
      }
      assert(alarms("z") === ((false, false)), "false alarm on uniform data")

      // replay batch 1: idempotent overwrite, refresh unchanged
      val before = refresh("z")
      sinkBody(uniform(2000, 4000).toDF(), 1L)
      assert(refresh("z") === before, "replayed batch moved the envelopes")

      // planted hot dimension: a skew batch concentrated in one tiny
      // (ck, od) cell → one bucket's share spikes → the drift alarm fires
      mem.addData((0 until 2000).map(i =>
        LayoutRow(100L + i % 50, d(10 + i % 5))): _*)
      q.processAllAvailable()
      Seq("z", "h").foreach { c =>
        assert(refresh(c) === batchTwin(c), s"$c stream != batch after skew batch")
      }
      val (hot, domain) = alarms("z")
      assert(hot, "planted hot bucket did not trip the drift alarm")
      assert(!domain, "no out-of-domain rows were planted yet")

      // domain growth: rows beyond the pinned ck bound alias into
      // in-domain buckets (16-bit lane mask) but stretch those buckets'
      // envelopes past the pinned bounds — the signal that the table
      // needs re-bounding/re-keying
      mem.addData((0 until 100).map(i =>
        LayoutRow(CkHi + 1000 + i, d(i % 1460))): _*)
      q.processAllAvailable()
      assert(alarms("z")._2, "out-of-domain rows did not trip the domain alarm")
      // stream == batch STILL holds including the drifted envelopes
      assert(refresh("z") === batchTwin("z"), "stream != batch after domain drift")
    } finally q.stop()
  }
}
