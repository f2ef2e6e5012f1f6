package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class DriftEvent(value: Double)

/** q205's streaming composition: distribution-drift monitoring over the
  * ingest pipeline — the check a 100 TB training-data feed runs before
  * letting new data into the mix. Per-batch raw values land under the
  * batch_id-keyed idempotent store (the q166/q167 refresh idiom); the
  * monitor computes the EXACT two-sample KS statistic (q205's integer
  * ECDF cross-multiplication — no fp in the supremum) between the fixed
  * reference window (batch 0) and everything after it. Planted truths:
  * a same-distribution batch must NOT alarm, a shifted batch MUST, and
  * a replayed batch changes neither answer. */
class StreamingDriftSpec extends SparkSpec {

  /** exact KS D as a rational (num, denom): sup|cumA·nB − cumB·nA| / nA·nB */
  private def ksExact(a: DataFrame, b: DataFrame): (Long, Long) = {
    val g = a.select(col("value").as("v"), lit(1L).as("isa"))
      .unionAll(b.select(col("value").as("v"), lit(0L).as("isa")))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("isa")).as("ca"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val n = g.agg(sum(col("ca")), sum(col("cnt") - col("ca"))).head()
    val (na, nb) = (n.getLong(0), n.getLong(1))
    val d = g.select(sum(col("cnt")).over(w).as("cumt"),
        sum(col("ca")).over(w).as("cuma"))
      .agg(max(abs(col("cuma") * nb - (col("cumt") - col("cuma")) * na)))
      .head().getLong(0)
    (d, na * nb)
  }

  test("KS drift monitor: stable batch silent, shifted batch alarms, replay a no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-drift").toString
    val raw = s"$root/raw"

    // reference + one same-distribution batch + one location-shifted batch
    def stable(seed: Int, n: Int): Seq[DriftEvent] =
      (0 until n).map(i => DriftEvent(((i * 37 + seed * 101) % 1000) / 10.0))
    def shifted(n: Int): Seq[DriftEvent] =
      (0 until n).map(i => DriftEvent(((i * 37) % 1000) / 10.0 + 60.0))
    val ref = stable(0, 600)
    val ok = stable(1, 600)
    val bad = shifted(600)

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[DriftEvent](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(ref: _*); q.processAllAvailable()
      mem.addData(ok: _*); q.processAllAvailable()
    } finally q.stop()

    def store = s.read.option("basePath", raw).parquet(raw)
    def monitor(): Double = {
      val refW = store.filter(col("batch_id") === 0).select(col("value"))
      val rest = store.filter(col("batch_id") > 0).select(col("value"))
      val (num, den) = ksExact(refW, rest)
      num.toDouble / den
    }

    val dStable = monitor()
    assert(dStable < 0.05, s"same-distribution batch alarmed: D=$dStable")

    // the shifted batch lands (simulate the pipeline's next trigger)
    sinkBody(bad.toDF("value"), 2L)
    val dDrift = monitor()
    assert(dDrift > 0.3, s"shifted batch did not alarm: D=$dDrift")

    // monitor result equals the batch-computed KS over the same multisets
    val (bn, bd) = ksExact(ref.toDF("value"), (ok ++ bad).toDF("value"))
    assert(math.abs(dDrift - bn.toDouble / bd) < 1e-12,
      "streaming-store KS diverged from the batch KS on identical data")

    // replay batch 1 (crash between sink write and offset commit): no-op
    sinkBody(ok.toDF("value"), 1L)
    assert(math.abs(monitor() - dDrift) < 1e-12, "replayed batch changed the monitor")
  }
}
