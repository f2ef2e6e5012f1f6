package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class VecRow(vec_id: Long, embedding: Seq[Float], label: Int)

/** q342's streaming composition: the benchmark embeddings are PINNED
  * (broadcast, fixed-size) and every landing micro-batch of corpus
  * vectors runs the same struct-max screen STATELESSLY — a vector's
  * max-cos depends only on itself and the static eval side, so
  * per-batch flag rows are exactly the batch-global ones and the
  * accumulated batch_id-keyed store equals the batch answer. The
  * 100 TB point mirrors q325's: semantic decontamination moves to
  * ingest time with no state store and no reshuffle of the stream. */
class StreamingSemanticDecontamSpec extends SparkSpec {

  private val Tau = 0.35

  private def v(id: Long, lab: Int, dir: Seq[Double]): VecRow = {
    // unit-norm-ish deterministic vectors; 8 dims is enough for cosine
    VecRow(id, dir.map(_.toFloat), lab)
  }

  test("stream screen == batch screen; planted leak alarms; replay no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-semdec").toString
    val raw = s"$root/flags"

    val evalVecs = Seq(
      v(0L, 1, Seq(1, 0, 0, 0, 0, 0, 0, 0)),
      v(97L, 2, Seq(0, 1, 0, 0, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id").as("eval_id"), col("embedding").as("ee"),
        col("label").as("eval_label"))

    val leaked = v(1L, 1, Seq(0.95, 0.1, 0.1, 0, 0, 0, 0, 0)) // near eval 0
    val cleanA = v(2L, 3, Seq(0, 0, 1, 1, 0, 0, 0, 0))        // orthogonal
    val cleanB = v(3L, 4, Seq(0, 0, 0, 0, 1, -1, 0, 0))

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      Governance.semanticScreenFor(batch, evalVecs)
        .filter(col("m.c") >= Tau)
        .select(col("vec_id"), (-col("m.nid")).as("nearest_eval"),
          col("m.c").as("c"))
        .write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[VecRow](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(cleanA); q.processAllAvailable()
      mem.addData(leaked, cleanB); q.processAllAvailable()
    } finally q.stop()

    def report(): Map[Long, (Long, Double)] =
      s.read.option("basePath", raw).parquet(raw)
        .select(col("vec_id"), col("nearest_eval"), col("c"))
        .as[(Long, Long, Double)].collect()
        .map { case (id, ne, c) => id -> (ne, c) }.toMap

    val streamed = report()
    // the planted near-copy MUST alarm against eval vec 0; clean ones not
    assert(streamed.keySet === Set(1L), streamed.toString)
    assert(streamed(1L)._1 === 0L)
    assert(streamed(1L)._2 >= Tau)

    // replayed batch id: idempotent overwrite, nothing changes
    sinkBody(Seq(leaked, cleanB).toDF("vec_id", "embedding", "label"), 1L)
    assert(report() == streamed, "replayed batch must be a no-op")

    // streaming == batch: all vectors through the batch screen in one go
    val allVecs = Seq(cleanA, leaked, cleanB)
      .toDF("vec_id", "embedding", "label")
    val batchRep = Governance.semanticScreenFor(allVecs, evalVecs)
      .filter(col("m.c") >= Tau)
      .select(col("vec_id"), (-col("m.nid")).as("nearest_eval"),
        col("m.c").as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (id, ne, c) => id -> (ne, c) }.toMap
    assert(batchRep == streamed, "streaming store and batch screen disagree")
  }
}
