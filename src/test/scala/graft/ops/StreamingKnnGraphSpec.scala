package graft.ops

import Loops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class KnnVec(vec_id: Long, embedding: Array[Float])

/** The kNN-graph family (q127/q128/q130) composed with the reference's
  * continuous-ingest core. The decomposition: a vector's CODE depends only
  * on its own embedding and the fixed hyperplanes, so coding is per-batch
  * map-side work landed into a batch_id-keyed idempotent store — but
  * unlike SemDeDup's prune, a NEW arrival can change an EXISTING vector's
  * top-k (it may enter someone's bucket with a higher cosine), so the
  * incremental maintenance rule is: re-rank ONLY the vectors whose probe
  * set intersects the new batch's codes, keep everyone else's edges
  * verbatim. The spec plants exactly that situation (a later arrival
  * displacing an earlier top-2 entry), asserts the affected-only
  * recompute equals the full batch answer at every step, that the
  * untouched vector's edges really were carried over (not recomputed),
  * and that a replayed batch is a no-op. */
class StreamingKnnGraphSpec extends SparkSpec {

  private val NP = 6 // code bits; small corpus, q127's default width
  private val TopK = 2

  /** 64-dim vectors: a tight cluster around direction A (axis 0 with
    * distinct small axis-1 perturbations — same plane signs, distinct
    * cosines) and one far-away loner around direction B. */
  private def vec(axis: Int, tilt: Float): Array[Float] = {
    val a = Array.fill(64)(0.001f) // constant bias keeps signs stable
    a(axis) = 1f
    a(axis + 1) = a(axis + 1) + tilt
    a
  }

  private val b1 = Seq(
    KnnVec(1L, vec(0, 0.10f)),  // A1
    KnnVec(2L, vec(0, 0.12f)),  // A2 — closest to A1 initially
    KnnVec(3L, vec(0, 0.30f)),  // A3 — initial 2nd neighbor of A1
    KnnVec(9L, vec(16, 0.10f))) // B1 — code 6 bits from cluster A's, no candidates
  private val b2 = Seq(
    KnnVec(4L, vec(0, 0.11f)))  // A4 — displaces A3 from A1's top-2

  private type Edges = Seq[(Long, Long, Int)]

  private def edgesOf(coded: DataFrame): Edges =
    GraphOps.knnEdgesFromCoded(coded, NP, TopK)
      .select(col("vec_id"), col("nbr_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted

  test("incremental kNN graph: affected-only re-rank equals the batch answer") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-knn").toString
    val store = s"$root/coded"

    // sink: the SAME map-side coding the batch query runs, landed
    // overwrite-by-batch_id so an engine-level replay cannot double rows
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      GraphOps.codedFrame(batch, NP)
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[KnnVec](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    def storeDF = s.read.parquet(store).select("vec_id", "embedding", "code")

    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val e1 = edgesOf(storeDF)
      assert(e1 == edgesOf(GraphOps.codedFrame(b1.toDF(), NP)),
        "end-state after batch 1 must equal the batch answer")
      // A1's initial top-2 is (A2, A3); B1 has no neighbors (own bucket)
      assert(e1.filter(_._1 == 1L).sortBy(_._3).map(_._2) == Seq(2L, 3L))
      assert(!e1.exists(_._1 == 9L))

      mem.addData(b2: _*); q.processAllAvailable()
      val all = storeDF.pin()

      // affected = vectors whose probe set intersects the new batch's
      // occupied codes, plus the arrivals themselves — everyone else's
      // edges carry over verbatim from e1
      val newCodes = GraphOps.codedFrame(b2.toDF(), NP)
        .select(col("code")).distinct()
      val affected = all
        .select(col("vec_id"), col("code"),
          explode(array((lit(0) +: (0 until NP).map(j => lit(1 << j))): _*))
            .as("flip"))
        .select(col("vec_id"), col("code").bitwiseXOR(col("flip")).as("probe"))
        .join(newCodes, col("probe") === col("code"), "left_semi")
        .select(col("vec_id")).distinct()
      val affectedIds = affected.collect().map(_.getLong(0)).toSet

      // the planted displacement: cluster A is affected, the loner is not
      assert(affectedIds == Set(1L, 2L, 3L, 4L),
        s"expected exactly cluster A + arrival affected, got $affectedIds")

      // re-rank ONLY the affected probe side; candidates still come from
      // the FULL store (an affected vector's neighbor can be unaffected)
      val recomputed = GraphOps.knnEdgesFromCoded(all, NP, TopK,
          probeSide = Some(all.join(affected, Seq("vec_id"), "left_semi")))
        .select(col("vec_id"), col("nbr_id"), col("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sorted
      val carried = e1.filter(e => !affectedIds.contains(e._1))
      val incremental = (recomputed ++ carried).sorted

      val batchAnswer = edgesOf(all)
      assert(incremental == batchAnswer,
        s"affected-only recompute diverges:\n$incremental\nvs\n$batchAnswer")
      // the displacement actually happened: A4 replaced A3 in A1's top-2
      assert(batchAnswer.filter(_._1 == 1L).sortBy(_._3).map(_._2) == Seq(4L, 2L))

      // replay batch 0 through the same sink body: end-state unchanged
      sinkBody(b1.toDF(), 0L)
      assert(edgesOf(storeDF) == batchAnswer,
        "replayed batch must not change the end-state graph")
    } finally q.stop()
  }
}
