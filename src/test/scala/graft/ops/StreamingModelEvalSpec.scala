package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class ScoredEx(score: Double, label: Int)

/** q206/q207's streaming composition: continuous evaluation of a filter
  * model over the ingest pipeline — scored examples land per batch under
  * the batch_id-keyed idempotent store, and a refresh recomputes the
  * midrank AUC and calibration gap over the accumulated store (the
  * q166/q167/StreamingDriftSpec idiom). Planted truths: the refresh
  * equals the batch computation on identical multisets, a batch of
  * label-flipped examples drags AUC toward 0.5, and a replayed batch
  * changes nothing. */
class StreamingModelEvalSpec extends SparkSpec {

  /** exact midrank AUC over (score, label) rows — integer rank sums, one
    * double division at the end (q206's identity, ModelEvalSpec-pinned) */
  private def auc(df: DataFrame): Double = {
    val g = df.groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("label")).as("pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val r = g.select(col("cnt"), col("pos"),
      (sum(col("cnt")).over(w) - col("cnt")).as("cum_before"))
    val row = r.agg(
      sum(col("pos") * (lit(2) * col("cum_before") + col("cnt") + 1)).as("r2"),
      sum(col("pos")).as("np"), sum(col("cnt") - col("pos")).as("nn")).head()
    val (r2, np, nn) = (row.getLong(0), row.getLong(1), row.getLong(2))
    (r2 - np * (np + 1)).toDouble / 2 / (np.toDouble * nn)
  }

  test("refresh AUC equals batch; a flipped batch degrades it; replay is a no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-eval").toString
    val raw = s"$root/raw"

    // a decent model: label mostly follows score (deterministic noise)
    def scored(seed: Int, n: Int, flip: Boolean): Seq[ScoredEx] =
      (0 until n).map { i =>
        val sc = ((i * 37 + seed * 101) % 1000) / 1000.0
        val noisy = (i * 7 + seed) % 10 == 0
        val y0 = if (sc > 0.5 ^ noisy) 1 else 0
        ScoredEx(sc, if (flip) 1 - y0 else y0)
      }
    val b0 = scored(0, 500, flip = false)
    val b1 = scored(1, 500, flip = false)
    val bad = scored(2, 500, flip = true)

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[ScoredEx](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    def store = s.read.option("basePath", raw).parquet(raw)
      .select(col("score"), col("label"))

    val aucGood = auc(store)
    val aucBatch = auc((b0 ++ b1).toDF("score", "label"))
    assert(math.abs(aucGood - aucBatch) < 1e-12,
      s"refresh AUC $aucGood != batch AUC $aucBatch")
    assert(aucGood > 0.85, s"planted model should rank well, AUC=$aucGood")

    // the poisoned batch lands: AUC must drop toward 0.5
    sinkBody(bad.toDF("score", "label"), 2L)
    val aucBad = auc(store)
    assert(aucBad < aucGood - 0.1,
      s"flipped batch did not degrade AUC: $aucGood -> $aucBad")

    // calibration gap over the accumulated store equals the batch gap
    def calGap(df: DataFrame): Double = {
      val r = df.agg((sum(col("score").cast("decimal(18,3)")).cast("double")
        / count(lit(1))).as("mp"),
        (sum(col("label")).cast("double") / count(lit(1))).as("or")).head()
      r.getDouble(0) - r.getDouble(1)
    }
    assert(math.abs(calGap(store)
      - calGap((b0 ++ b1 ++ bad).toDF("score", "label"))) < 1e-12)

    // replay batch 1 (crash between sink write and offset commit): no-op
    sinkBody(b1.toDF("score", "label"), 1L)
    assert(math.abs(auc(store) - aucBad) < 1e-12, "replayed batch changed AUC")
  }
}
