package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder (a suite-nested case
// class has no reachable outer instance)
case class SemVec(vec_id: Long, embedding: Array[Float])

/** The semantic-dedup family (q113) must compose with the reference's
  * continuous-ingest core the same way MinHash and chunk/containment do:
  * per-micro-batch map-side ASSIGNMENT against a pinned seed table into a
  * batch_id-keyed idempotent store, with the within-cluster prune
  * aggregated over the accumulated assignments.
  *
  * The decomposition is sound because [[VectorSearch.assignToSeeds]]
  * depends only on (own embedding, seed table): per-batch assignment
  * against a FIXED seed table equals the batch-global one for the same
  * vectors. Pinning seeds is the production pattern — recluster
  * periodically, assign continuously (the k ∝ N growth happens at
  * recluster time, not per batch). The spec drives three batches with
  * near-dup pairs spanning batches 1↔3 in BOTH clusters, keeps one
  * same-cluster vector dissimilar enough to survive (τ guard, not just
  * cluster membership), then replays a batch and asserts the end-state
  * prune report is byte-identical to the batch answer both times. */
class StreamingSemDedupSpec extends SparkSpec {

  private def v(xs: Float*): Array[Float] = xs.toArray

  /** Two fixed orthogonal anchors; vectors are planted so that
    * cluster membership AND the within-cluster τ=0.4 prune are both
    * exercised: a=(1,.9) and b=(1,-.9) share cluster 0 but their pair
    * cosine is (1-.81)/1.81 ≈ 0.105 — b must survive. */
  private val b1 = Seq(SemVec(1L, v(1f, 0.9f, 0f, 0f)),   // cluster 0 anchor "a"
                       SemVec(2L, v(0.1f, 1f, 0f, 0f)))   // cluster 1 anchor
  private val b2 = Seq(SemVec(3L, v(1f, -0.9f, 0f, 0f)))  // cluster 0, dissimilar
  private val b3 = Seq(SemVec(5L, v(1f, 0.85f, 0f, 0f)),  // ≈ vec 1 → pruned
                       SemVec(6L, v(0.1f, 1f, 0.05f, 0f))) // ≈ vec 2 → pruned

  private def seeds = {
    val s = spark
    import s.implicits._
    Seq((0L, v(1f, 0f, 0f, 0f)), (1L, v(0f, 1f, 0f, 0f))).toDF("seed_id", "se")
  }

  private def report(assigned: DataFrame): Seq[(Long, Long, Double, Long)] =
    VectorSearch.semanticDedupPrune(assigned)
      .orderBy("pruned_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("semantic dedup composes with foreachBatch + idempotent batch_id sink") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-semdedup").toString
    val store = s"$root/assigned"

    // the sink body: the SAME map-side assignment the batch query runs
    // against the pinned seed table, landed like Pipeline's sink —
    // overwrite-by-batch_id, so an engine-level replay cannot double rows
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      VectorSearch.assignToSeeds(batch, seeds)
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[SemVec](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def endState(): Seq[(Long, Long, Double, Long)] =
      report(s.read.parquet(store).select("vec_id", "emb", "nrm", "seed_id"))

    val batchAnswer = report(
      VectorSearch.assignToSeeds((b1 ++ b2 ++ b3).toDF(), seeds))

    val streamed = endState()
    assert(streamed == batchAnswer,
      s"incremental end-state diverges from the batch answer:\n$streamed\nvs\n$batchAnswer")
    // both cross-batch near-dup pairs found, keep-first attribution intact
    assert(streamed.map(r => (r._1, r._2, r._4)) ===
      Seq((5L, 0L, 1L), (6L, 1L, 2L)),
      s"expected vec 5 pruned as dup of 1 (cluster 0) and 6 of 2 (cluster 1): $streamed")
    // the dissimilar same-cluster vector survives: τ prunes on pair cosine,
    // not on cluster membership
    assert(!streamed.exists(_._1 == 3L))

    // REPLAY batch 1 through the same sink body (checkpoint recovery after
    // a crash between sink write and offset commit): no-op for the report
    sinkBody(b1.toDF(), 0L)
    assert(endState() == batchAnswer,
      "replayed batch must not change the end-state prune report")
  }
}
