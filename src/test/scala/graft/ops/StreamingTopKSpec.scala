package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.MisraGries

// top-level so Catalyst can build a codegen'd Encoder
case class StreamItem(item: String)

/** q167's heavy-hitters path composed with the continuous-ingest core
  * (SURVEY.md §2.1 S10–S12): each micro-batch lands its raw items AND its
  * bounded Misra–Gries partial sketch under the batch_id-keyed idempotent
  * store. Candidates come from MERGING the per-batch sketches — sound
  * because MG is a mergeable summary: decrement error stays additive
  * across any merge tree, so an item heavy in the ACCUMULATED stream is
  * retained even if no single batch considered it heavy. The exact top-k
  * then recounts candidates against the accumulated raw store, exactly
  * like the batch q167. Replaying a batch through the same sink body is a
  * no-op (overwrite-by-batch_id), so checkpoint recovery cannot double
  * either the raw counts or a batch's sketch. */
class StreamingTopKSpec extends SparkSpec {

  private val K = 32

  test("merged per-batch MG sketches + recount equal the batch top-10 across replay") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-topk").toString
    val raw = s"$root/raw"
    val sk = s"$root/sketch"

    // three batches over a 200-item vocabulary (≫ 2K=64 counters, so the
    // sketch PRUNES in every batch). Ten genuinely heavy items — every
    // one above the merged guarantee threshold n/K (n≈1035, n/32≈32):
    // "hot" (165), "warm" (60, spread 20/batch — heavy ONLY in
    // aggregate, the case pure per-batch top-k would drop) and h0..h7
    // (45 each, 15/batch). The noise tail tops out at count 3, far
    // below the 10th heavy count, so the exact top-10 is unambiguous
    // and provably inside the merged candidate set.
    def noise(seed: Int, n: Int): Seq[String] =
      (0 until n).map(i => f"n${(i * 31 + seed * 7) % 200}%03d")
    def heavies(per: Int): Seq[String] =
      (0 until 8).flatMap(h => Seq.fill(per)(s"h$h"))
    val b1 = Seq.fill(60)("hot") ++ Seq.fill(20)("warm") ++ heavies(15) ++ noise(1, 150)
    val b2 = Seq.fill(55)("hot") ++ Seq.fill(20)("warm") ++ heavies(15) ++ noise(2, 150)
    val b3 = Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++ heavies(15) ++ noise(3, 150)

    def sinkBody(batch: DataFrame, batchId: Long): Unit = {
      batch.write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")
      val mg = MisraGries(K)
      val sketchRows = batch.as[StreamItem].map(_.item)
        .select(mg.toColumn).toDF("cands")
        // persist the candidate set; counts live in the raw store — the
        // candidate SET is what the merge guarantee is about
        .select(explode(col("cands")).as("item"))
      sketchRows.write.mode("overwrite").parquet(s"$sk/batch_id=$batchId")
    }

    val mem = MemoryStream[StreamItem](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1.map(StreamItem): _*); q.processAllAvailable()
      mem.addData(b2.map(StreamItem): _*); q.processAllAvailable()
      mem.addData(b3.map(StreamItem): _*); q.processAllAvailable()
    } finally q.stop()

    def top10(items: DataFrame, cands: DataFrame): Seq[(String, Long)] =
      items.join(broadcast(cands.select(col("item")).distinct()), Seq("item"))
        .groupBy(col("item")).agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("item").asc).limit(10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    val streamed = top10(
      s.read.parquet(raw).select("item"),
      s.read.parquet(sk))
    // batch reference: exact top-10 over everything, no sketch at all
    val all = (b1 ++ b2 ++ b3).toDF("item")
    val exact = all.groupBy(col("item")).agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed == exact,
      s"sketch-merged top-10 diverges from exact:\n$streamed\nvs\n$exact")
    assert(streamed.head._1 == "hot" && streamed.head._2 == 165L)
    assert(streamed.exists(_._1 == "warm"),
      s"cross-batch heavy hitter 'warm' (60 total) missing: $streamed")

    // replay batch 1 (crash between sink write and offset commit):
    // overwrite-by-batch_id keeps both stores — and the answer — fixed
    sinkBody(b1.map(StreamItem).toDF(), 0L)
    val replayed = top10(s.read.parquet(raw).select("item"), s.read.parquet(sk))
    assert(replayed == exact, "replayed batch changed the top-10")
  }
}
