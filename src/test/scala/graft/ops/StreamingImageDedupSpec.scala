package graft.ops

import Loops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class ImgDoc(doc_id: Long, text: String)

/** The image near-dup family (q142/q143) composed with the reference's
  * continuous-ingest core. The decomposition mirrors StreamingMinHashSpec,
  * with one structural simplification the spec proves: a document's dHash
  * depends only on its own payload, so hashing is per-batch map-side work
  * landed into a batch_id-keyed idempotent store — and unlike kNN top-k,
  * the near-dup PAIR SET is MONOTONE (a new arrival can only ADD pairs,
  * never displace an existing one), so incremental maintenance is exactly
  * `pairs(new × accumulated)` unioned onto the carried set, no affected-
  * set recomputation at all. The spec plants a cross-batch exact dup and
  * a cross-batch banded near pair, asserts increment-union equals the
  * batch answer after every arrival, and that a replayed batch id is a
  * no-op. */
class StreamingImageDedupSpec extends SparkSpec {

  /** Batch 1: two exact dups (same text) + one loner. Batch 2: a third
    * copy of the dup text (cross-batch d=0 pairs) + a fresh doc. */
  private val dupText = "the quick brown fox jumps over the lazy dog again and again"
  private val b1 = Seq(
    ImgDoc(1L, dupText),
    ImgDoc(2L, dupText),
    ImgDoc(3L, "completely different content with many unusual words inside"))
  private val b2 = Seq(
    ImgDoc(4L, dupText),
    ImgDoc(5L, "yet another unrelated document body for the second arrival"))

  private type Pairs = Set[(Long, Long, Long)]

  private def pairsOf(h: DataFrame): Pairs =
    ImageOps.neardupPairs(h)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // the SAME map-side codec path the batch queries run (not a re-derivation
  // that could drift from it)
  private def hashOf(batch: DataFrame): DataFrame =
    ImageOps.dhashFrameFrom(batch)

  test("incremental image dedup: monotone pair increments equal the batch answer") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-img").toString
    val store = s"$root/hashes"

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      hashOf(batch).write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[ImgDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def storeDF = s.read.parquet(store)
      .select("doc_id", "dhash_hi", "dhash_lo")

    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val all1 = storeDF.pin()
      val p1 = pairsOf(all1)
      assert(p1.contains((1L, 2L, 0L)), "batch-1 exact dup pair missing")

      mem.addData(b2: _*); q.processAllAvailable()
      val all2 = storeDF.pin()

      // incremental rule: the engine's probeDocs hook restricts every
      // join's probe side to the ARRIVALS (cost ∝ batch, candidates from
      // the full store); carry p1 verbatim and union
      val newIds = b2.map(_.doc_id)
      val pd = newIds.toDF("doc_id")
      val increment = ImageOps.neardupPairs(all2, probeDocs = Some(pd))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the increment really is batch-scoped
      assert(increment.forall { case (a, b, _) =>
        newIds.contains(a) || newIds.contains(b) })
      val batchAnswer = pairsOf(all2)
      assert((p1 ++ increment) == batchAnswer,
        s"increment union diverges from the batch answer:\n${p1 ++ increment}\nvs\n$batchAnswer")
      // the planted cross-batch exact dups arrived: 4 pairs with doc 4
      assert(batchAnswer.contains((1L, 4L, 0L)) && batchAnswer.contains((2L, 4L, 0L)),
        "cross-batch exact-dup pairs missing")
      // monotonicity really held (nothing from p1 vanished)
      assert(p1.subsetOf(batchAnswer))

      // replayed batch id: overwrite of the same dir, a store-level no-op
      sinkBody(b2.toDF(), 1L)
      assert(pairsOf(storeDF) == batchAnswer, "replay changed the pair set")
    } finally q.stop()
  }
}
