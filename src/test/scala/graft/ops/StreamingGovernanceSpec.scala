package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build codegen'd Encoders
case class GovRow(nation: Int, segment: String)
case class SkewRow(k: Long)

/** Streaming twins for the governance audits — the pre-flight gates a
  * landing stream wants CONTINUOUSLY, not once per nightly batch:
  * q235 k-anonymity and q248 join-key skew. Both decompose the same way
  * (the q166/q167 refresh idiom): each micro-batch lands its PARTIAL
  * class/key counts under the batch_id-keyed idempotent store — counts
  * are additive, so re-summing accumulated partials is the plain
  * map-side-combine identity — and the refresh runs the REAL audit code
  * ([[Governance.kAnonymityFor]] / [[Stats3.keySkewFor]]) over the
  * re-aggregated frame. Planted truths: a class/key whose mass is split
  * ACROSS batches must be audited at its accumulated count (any
  * single-batch view undercounts it), and an engine-level batch replay
  * must change nothing. */
class StreamingGovernanceSpec extends SparkSpec {

  test("k-anonymity refresh == batch audit; cross-batch classes accumulate; replay no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-kanon").toString
    val store = s"$root/classes"

    // class (7, "X") gets 2 rows in batch 1 and 2 in batch 3: per-batch it
    // looks <k for k=5 at cnt 2, accumulated it must audit at cnt 4
    val b1 = Seq.tabulate(30)(i => GovRow(i % 3, "A")) ++
      Seq(GovRow(7, "X"), GovRow(7, "X"))
    val b2 = Seq.tabulate(20)(i => GovRow(i % 2, "B")) ++ Seq(GovRow(9, "Y"))
    val b3 = Seq.tabulate(25)(i => GovRow(i % 5, "A")) ++
      Seq(GovRow(7, "X"), GovRow(7, "X"))

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.groupBy(col("nation"), col("segment"))
        .agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[GovRow](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def refresh(): Seq[(Long, Long, Long, Long)] =
      Governance.kAnonymityFor(
        s.read.parquet(store)
          .groupBy(col("nation"), col("segment"))
          .agg(sum(col("cnt")).as("cnt")))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val streamed = refresh()
    val batch = Governance.kAnonymityFor(
      (b1 ++ b2 ++ b3).toDF()
        .groupBy(col("nation"), col("segment")).agg(count(lit(1)).as("cnt")))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed == batch,
      s"streaming refresh diverges from batch audit:\n$streamed\nvs\n$batch")

    // the planted cross-batch class: cnt 4 → at risk for k=5 (4 < 5) but
    // NOT for k=2; a per-batch-only audit would see cnt 2 and flag k=2
    // rows too — accumulation is what makes the k=2 row's counts right
    val k2 = streamed.find(_._1 == 2).get
    val k5 = streamed.find(_._1 == 5).get
    assert(k5._3 >= 1, s"k=5 must flag the accumulated cnt-4 class: $k5")
    assert(k2._4 == batch.find(_._1 == 2).get._4)

    // replay batch 1 through the same sink body: overwrite-by-batch_id
    // makes it a no-op for the refresh
    sinkBody(b1.toDF(), 0L)
    assert(refresh() == batch, "replayed batch changed the k-anonymity audit")
  }

  test("key-skew refresh == batch audit; a hot key accumulating across batches shows in the shares") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-skew").toString
    val store = s"$root/freq"

    // key 1 is hot and arrives SPREAD over batches; background keys are
    // near-uniform — only the accumulated view sees the true top1 share
    def hot(n: Int) = Seq.fill(n)(SkewRow(1L))
    def bg(seed: Int, n: Int) = (0 until n).map(i => SkewRow(100L + (i * 7 + seed) % 50))
    val b1 = hot(40) ++ bg(0, 100)
    val b2 = hot(40) ++ bg(1, 100)
    val b3 = hot(40) ++ bg(2, 100)

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[SkewRow](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def accumulated(): DataFrame =
      s.read.parquet(store).groupBy(col("k")).agg(sum(col("cnt")).as("cnt"))

    val streamed = Stats3.keySkewFor(accumulated()).head()
    val batch = Stats3.keySkewFor(
      (b1 ++ b2 ++ b3).toDF().groupBy(col("k")).agg(count(lit(1)).as("cnt")))
      .head()
    assert(streamed == batch,
      s"streaming refresh diverges from batch audit:\n$streamed\nvs\n$batch")

    // the accumulated hot key: 120 of 420 rows → top1_share ≈ 0.2857;
    // any single batch alone would report 40/140 too — but a MONITOR
    // that only ever saw per-batch frames could never distinguish a
    // recurring hot key from three different ones; the accumulated
    // audit pins it to one key
    assert(math.abs(streamed.getDouble(2) - 120.0 / 420.0) < 1e-6,
      s"top1 share: ${streamed.getDouble(2)}")
    assert(streamed.getLong(0) == 51, s"n_keys: ${streamed.getLong(0)}")

    // replay the middle batch: no-op
    sinkBody(b2.toDF(), 1L)
    assert(Stats3.keySkewFor(accumulated()).head() == batch,
      "replayed batch changed the key-skew audit")
  }
}
