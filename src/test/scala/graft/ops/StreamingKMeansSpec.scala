package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class KmVec(vec_id: Long, embedding: Array[Float])

/** The k-means family composed with the continuous-ingest core — the
  * recluster-periodically / assign-continuously production pattern made
  * concrete: per micro-batch, map-side [[VectorSearch.assignToSeeds]]
  * against PINNED centroids lands in the batch_id-keyed idempotent store;
  * the periodic refresh is [[VectorSearch.centroidRebuild]] over the
  * accumulated assignments (exact DECIMAL means are order-independent,
  * so the store-rebuild equals the batch rebuild bit-for-bit), followed
  * by a re-assignment pass. The spec plants a boundary vector that the
  * refresh legitimately FLIPS to the other cluster — the reason periodic
  * reclustering exists — and proves replay is a no-op at both stages. */
class StreamingKMeansSpec extends SparkSpec {

  private def v(xs: Float*): Array[Float] = xs.toArray

  // pinned round-0 centroids: the two axes
  private def seeds0 = {
    val s = spark
    import s.implicits._
    Seq((0L, v(1f, 0f, 0f, 0f)), (1L, v(0f, 1f, 0f, 0f))).toDF("seed_id", "se")
  }

  // cluster A hugs axis 0; cluster B tilts toward axis 0 (so the refresh
  // pulls centroid 1 toward x and captures the boundary vector m)
  private val b1 = Seq(KmVec(1L, v(1f, 0.1f, 0f, 0f)),    // A
                       KmVec(10L, v(0.5f, 1f, 0f, 0f)))   // B
  private val b2 = Seq(KmVec(5L, v(0.75f, 0.66f, 0f, 0f)), // m: boundary
                       KmVec(11L, v(0.5f, 1.05f, 0f, 0f))) // B
  private val b3 = Seq(KmVec(2L, v(1f, -0.1f, 0f, 0f)))   // A

  private def assignMap(assigned: DataFrame): Map[Long, Long] =
    assigned.select("vec_id", "seed_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def centroidMap(c: DataFrame): Map[Long, Seq[Double]] =
    c.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap

  test("streaming k-means: pinned assignment, store rebuild, refresh flip, replay") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-kmeans").toString
    val store = s"$root/assigned"

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      VectorSearch.assignToSeeds(batch, seeds0)
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[KmVec](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def storeDF = s.read.parquet(store).select("vec_id", "emb", "nrm", "seed_id")

    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val all = (b1 ++ b2 ++ b3).toDF()
    val batchAssign = VectorSearch.assignToSeeds(all, seeds0)

    // (1) accumulated per-batch assignment == batch assignment; the
    // boundary vector starts in cluster 0
    val streamed = assignMap(storeDF)
    assert(streamed == assignMap(batchAssign), "pinned assignment diverged")
    assert(streamed(5L) == 0L, "boundary vector must start in cluster 0")

    // (2) the periodic refresh: rebuild from the accumulated store equals
    // the batch rebuild (exact DECIMAL means are order-independent)
    def asEmb(df: DataFrame) = df.select(col("seed_id"), col("emb").as("embedding"))
    val c1Store = centroidMap(VectorSearch.centroidRebuild(asEmb(storeDF)))
    val c1Batch = centroidMap(VectorSearch.centroidRebuild(asEmb(batchAssign)))
    assert(c1Store == c1Batch, s"store rebuild $c1Store vs batch $c1Batch")

    // (3) re-assignment after the refresh flips the boundary vector —
    // the capture that periodic reclustering exists to make
    val refreshed = VectorSearch.centroidRebuild(asEmb(storeDF))
      .select(col("seed_id"), col("ce").as("se"))
    val after = assignMap(VectorSearch.assignToSeeds(
      storeDF.select(col("vec_id"), col("emb").as("embedding")), refreshed))
    assert(after(5L) == 1L, s"refresh should capture the boundary vector: $after")
    assert(after(1L) == 0L && after(2L) == 0L && after(10L) == 1L && after(11L) == 1L)

    // (4) replay: idempotent store → assignment AND rebuild unchanged
    sinkBody(b1.toDF(), 0L)
    assert(assignMap(storeDF) == streamed)
    assert(centroidMap(VectorSearch.centroidRebuild(asEmb(storeDF))) == c1Store)
  }
}
