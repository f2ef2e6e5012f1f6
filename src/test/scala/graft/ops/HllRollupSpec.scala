package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class HllEvent(user: String)

/** q181's mergeable-HLL contract: what the rows-only driver check cannot
  * state. (1) estimates track exact distinct counts within the sketch's
  * error envelope on the testdata AND on a 100k-distinct synthetic stream
  * (the regime where HLL actually estimates); (2) the ALL row — built by
  * unioning per-type STATES, never rescanning rows — agrees with a
  * directly-built global sketch; (3) the streaming composition: per-batch
  * sketch states landed under a batch_id-keyed idempotent store roll up
  * to the batch answer, and a replayed batch changes nothing — the
  * AggregatingMergeTree / uniqMerge idiom over the ingest core. */
class HllRollupSpec extends SparkSpec {

  test("q181 estimates are within 5% of exact distinct counts") {
    val s = spark
    val got = graft.SparkEntry.queries("q181_hll_rollup")(s, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val ev = graft.schema.Tables.t(s, sf001, "events")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"), countDistinct(col("props")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap ++
      Map("ALL" -> {
        val r = ev.agg(countDistinct(col("user_id")), countDistinct(col("props"))).head()
        (r.getLong(0), r.getLong(1))
      })
    exact.foreach { case (k, (u, p)) =>
      val (gu, gp) = got(k)
      assert(math.abs(gu - u) <= math.max(1L, (0.05 * u).toLong),
        s"$k: approx_users $gu vs exact $u")
      assert(math.abs(gp - p) <= math.max(1L, (0.05 * p).toLong),
        s"$k: approx_props $gp vs exact $p")
    }
  }

  test("union of partial sketches tracks the direct sketch at 100k distinct") {
    val s = spark
    import s.implicits._
    // 120k rows, 100k distinct (ids 0..99999, the first 20k twice)
    val ids = s.range(0, 120000).select(pmod(col("id"), lit(100000L)).cast("string").as("u"))
    val direct = ids.agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("e"))
      .head().getLong(0)
    val unioned = ids
      .withColumn("shard", pmod(xxhash64(col("u")), lit(8)))
      .groupBy(col("shard")).agg(hll_sketch_agg(col("u")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    assert(math.abs(direct - 100000L) < 3000, s"direct estimate $direct off by >3%")
    assert(math.abs(unioned - 100000L) < 3000, s"unioned estimate $unioned off by >3%")
    assert(math.abs(direct - unioned) < 2000,
      s"union-of-states ($unioned) drifted from direct sketch ($direct)")
  }

  test("streaming: per-batch sketch states roll up to the batch answer across replay") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-hll").toString
    val sk = s"$root/sketch"
    def batchUsers(seed: Int, n: Int): Seq[String] =
      (0 until n).map(i => s"u${(i * 7 + seed * 1000) % 3000}")
    val b1 = batchUsers(0, 1500) // users u0,u7,… — overlaps later batches
    val b2 = batchUsers(1, 1500)
    val b3 = batchUsers(2, 1500)

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.agg(hll_sketch_agg(col("user")).as("sk"))
        .write.mode("overwrite").parquet(s"$sk/batch_id=$batchId")

    val mem = MemoryStream[HllEvent](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1.map(HllEvent): _*); q.processAllAvailable()
      mem.addData(b2.map(HllEvent): _*); q.processAllAvailable()
      mem.addData(b3.map(HllEvent): _*); q.processAllAvailable()
    } finally q.stop()

    def rolledUp(): Long = s.read.parquet(sk)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e")).head().getLong(0)

    val exact = (b1 ++ b2 ++ b3).distinct.size.toLong
    val streamed = rolledUp()
    assert(math.abs(streamed - exact) <= math.max(2L, (0.05 * exact).toLong),
      s"rolled-up estimate $streamed vs exact $exact")

    // replay batch 0 (crash between sink write and offset commit):
    // overwrite-by-batch_id keeps the state store — and the answer — fixed
    sinkBody(b1.map(HllEvent).toDF().toDF("user"), 0L)
    assert(rolledUp() == streamed, "replayed batch changed the rolled-up estimate")
  }
}
