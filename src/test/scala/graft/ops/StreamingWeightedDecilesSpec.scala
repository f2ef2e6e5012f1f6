package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class WeightedObs(v: Double, w: Long)

/** q168's streaming composition (VERDICT r9 item 5): exact weighted
  * quantiles over a landing stream. The store does NOT carry raw rows —
  * each batch lands its per-value weighted PARTIAL sums (v, Σw) under
  * the batch_id-keyed idempotent store, bounded by the batch's distinct
  * values rather than its row count. A refresh re-aggregates the
  * accumulated partials by value and runs the q168 machinery (stitched
  * weighted running sum + integer covering-decile explode) over the
  * (v, w) frame. That is EXACT, not approximate: weighted quantiles
  * are a function of per-value total weights alone — the value-level
  * cumulative weight crosses each d·W/10 threshold at exactly the same
  * value as the row-level running sum does. */
class StreamingWeightedDecilesSpec extends SparkSpec {

  private def exactDeciles(vw: DataFrame): Seq[(Long, Double)] = {
    val s = vw.sparkSession
    val cum = Skew.globalRunningSum(vw.select(col("v"), col("w")),
      Seq(col("v").asc), value = col("w"),
      numPartitions = s.conf.get("spark.sql.shuffle.partitions").toInt,
      totalCol = Some("tw"))
    cum.select(col("v"), explode(expr(
      """CASE WHEN (cum - w) * 10 DIV tw + 1 <= least(cum * 10 DIV tw, 9L)
        |  THEN sequence((cum - w) * 10 DIV tw + 1, least(cum * 10 DIV tw, 9L))
        |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)).as("decile"))
      .filter(col("decile").between(1, 9))
      .groupBy(col("decile")).agg(min(col("v")).as("value"))
      .orderBy(col("decile"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("streamed weighted deciles over accumulated partials equal batch q168 across replay") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-wdec").toString
    val store = s"$root/store"

    def batchRows(seed: Int, n: Int): Seq[WeightedObs] =
      (0 until n).map { i =>
        // deliberate cross-batch value collisions (the partials must MERGE)
        WeightedObs(((i * 13 + seed * 7) % 50).toDouble, (i % 9 + 1).toLong)
      }
    val b1 = batchRows(0, 300)
    val b2 = batchRows(1, 300)
    val b3 = batchRows(2, 300)

    // per-batch weighted partial sums — the bounded-state landing
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.groupBy(col("v")).agg(sum(col("w")).as("w"))
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[WeightedObs](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    // refresh: merge accumulated partials, then the exact q168 machinery
    val refreshed = exactDeciles(
      s.read.parquet(store).groupBy(col("v")).agg(sum(col("w")).as("w")))

    // batch reference: the literal q168 shape over the raw multiset
    // (row-level running sum with a unique tiebreaker)
    val raw = (b1 ++ b2 ++ b3).zipWithIndex
      .map { case (o, i) => (o.v, o.w, i.toLong) }.toDF("v", "w", "idx")
    val cumRaw = Skew.globalRunningSum(raw,
      Seq(col("v").asc, col("idx").asc), value = col("w"),
      numPartitions = 4, totalCol = Some("tw"))
    val batchAnswer = cumRaw.select(col("v"), explode(expr(
      """CASE WHEN (cum - w) * 10 DIV tw + 1 <= least(cum * 10 DIV tw, 9L)
        |  THEN sequence((cum - w) * 10 DIV tw + 1, least(cum * 10 DIV tw, 9L))
        |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)).as("decile"))
      .filter(col("decile").between(1, 9))
      .groupBy(col("decile")).agg(min(col("v")).as("value"))
      .orderBy(col("decile"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    assert(refreshed.size == 9)
    assert(refreshed == batchAnswer,
      s"streamed deciles diverged from batch q168:\n$refreshed\nvs\n$batchAnswer")

    // replay batch 1 (crash between sink write and offset commit): the
    // batch_id-keyed overwrite makes it a no-op
    sinkBody(b2.toDF("v", "w"), 1L)
    val replayed = exactDeciles(
      s.read.parquet(store).groupBy(col("v")).agg(sum(col("w")).as("w")))
    assert(replayed == batchAnswer, "replayed batch changed the deciles")
  }
}
