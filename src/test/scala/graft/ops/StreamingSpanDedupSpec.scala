package graft.ops

import Loops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class SpanDoc(doc_id: Long, text: String)

/** q141's span coalescing composed with the continuous-ingest core — the
  * interesting one, because unlike MinHash bands (q41), SemDeDup prunes
  * (q113), or image pairs (StreamingImageDedupSpec), removal intervals
  * are NOT monotone under arrivals: a new document can flip an 8-gram
  * from unique to duplicated, which flags NEW positions inside OLD
  * documents and extends or merges their islands. The incremental rule
  * is therefore recompute-the-affected:
  *
  *   affected = holders of grams whose dup status changed this batch
  *              ∪ the arrivals themselves;
  *   carried  = every other doc's intervals, verbatim.
  *
  * The spec plants exactly the flip (doc C's unique tail gram is
  * duplicated by arrival D), asserts the affected set is {C, D} and
  * nothing else, that the affected-only rebuild over the accumulated
  * store equals the full batch answer, that C's intervals really
  * changed (island EXTENDED into the flipped region), that A/B's were
  * carried, and that a replayed batch id is a no-op. */
class StreamingSpanDedupSpec extends SparkSpec {

  // 8-word grams. A and B share their first 9 words (two overlapping
  // duplicated grams -> one island each); C shares nothing in batch 1 but
  // its LAST 9 words (grams at positions 7 and 8) reappear verbatim in
  // arrival D (batch 2) — the planted unique->duplicated flip.
  private val shared = (1 to 9).map(i => s"dup$i").mkString(" ")
  private val tail9 = (1 to 9).map(i => s"flip$i").mkString(" ")
  private val b1 = Seq(
    SpanDoc(1L, s"$shared a10 a11 a12 a13 a14 a15"),
    SpanDoc(2L, s"$shared b10 b11 b12 b13 b14 b15"),
    SpanDoc(3L, s"c1 c2 c3 c4 c5 c6 $tail9"))
  private val b2 = Seq(
    SpanDoc(4L, s"d1 d2 d3 $tail9"))

  private type Spans = Set[(Long, Long, Long, Long, Long)]

  private def spansOf(df: DataFrame): Spans =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  private def landed(batch: DataFrame): DataFrame =
    SubstringOps.gramRowsPosFrom(batch)
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("gm"))

  test("incremental span dedup: affected-only rebuild equals the batch answer") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-span").toString
    val store = s"$root/grams"

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      landed(batch).write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[SpanDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def storeDF = s.read.parquet(store).select("doc_id", "pos", "gm")

    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val g1 = storeDF.pin()
      val spans1 = spansOf(SubstringOps.dupSpanIntervalsFrom(g1))
      // batch 1: A and B each carry ONE island over the 9 shared words
      // (grams at pos 1 and 2 coalesce to [1, 9]); C has nothing yet
      assert(spans1 == Set((1L, 1L, 9L, 9L, 2L), (2L, 1L, 9L, 9L, 2L)),
        s"unexpected batch-1 spans: $spans1")

      // dup statuses before the arrival, for the invalidation rule
      val dupsBefore = g1.groupBy(col("gm"))
        .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
        .select(col("gm"))

      mem.addData(b2: _*); q.processAllAvailable()
      val g2 = storeDF.pin()

      // newly-duplicated grams: dup AFTER minus dup BEFORE
      val dupsAfter = g2.groupBy(col("gm"))
        .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
        .select(col("gm"))
      val newlyDup = dupsAfter.join(dupsBefore, Seq("gm"), "left_anti")
      // affected = holders of newly-dup grams + the arrivals
      val affected = g2.join(newlyDup, Seq("gm"), "left_semi")
        .select(col("doc_id"))
        .union(b2.map(_.doc_id).toDF("doc_id"))
        .distinct()
      val affectedIds = affected.collect().map(_.getLong(0)).toSet
      assert(affectedIds == Set(3L, 4L),
        s"the flip must affect exactly C and the arrival, got $affectedIds")

      // incremental: rebuild ONLY the affected docs (dup statistic over
      // the FULL store), carry everyone else verbatim
      val rebuilt = spansOf(
        SubstringOps.dupSpanIntervalsFrom(g2, onlyDocs = Some(affected)))
      val carried = spans1.filter(sp => !affectedIds.contains(sp._1))
      val incremental = carried ++ rebuilt
      val batchAnswer = spansOf(SubstringOps.dupSpanIntervalsFrom(g2))
      assert(incremental == batchAnswer,
        s"affected-only rebuild diverges:\n$incremental\nvs\n$batchAnswer")
      // the non-monotone flip really happened: C gained an island over its
      // tail 9 words (grams at pos 7 and 8 -> [7, 15]) that batch 1 never had
      assert(batchAnswer.contains((3L, 7L, 15L, 9L, 2L)),
        s"C's flipped island missing: $batchAnswer")
      assert(!spans1.exists(_._1 == 3L))
      // and A/B were genuinely carried, not changed
      assert(batchAnswer.filter(sp => sp._1 == 1L || sp._1 == 2L) ==
        carried.filter(sp => sp._1 == 1L || sp._1 == 2L))

      // replayed batch id: overwrite of the same dir is a store-level no-op
      sinkBody(b2.toDF(), 1L)
      val g3 = storeDF.pin()
      assert(g3.count() == g2.count(), "replay must not grow the store")
      assert(spansOf(SubstringOps.dupSpanIntervalsFrom(g3)) == batchAnswer)
    } finally q.stop()
  }
}
