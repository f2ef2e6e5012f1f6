package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class BloomDoc(doc_id: Long, text: String)

/** q325's streaming composition: the bloom screen is built ONCE from the
  * static benchmark (8 KB of packed longs in the task closure) and every
  * landing micro-batch probes it STATELESSLY — a doc's shingles depend
  * only on itself, so per-batch flag rows ARE the batch-global rows and
  * the accumulated batch_id-keyed store equals the batch answer. That
  * statelessness is the operational point at 100 TB: decontamination
  * moves to ingest time with no state store, no join, no reshuffle of
  * the landing stream. */
class StreamingBloomSpec extends SparkSpec {

  test("stream screen == batch screen; leak alarms; replay is a no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-bloom").toString
    val raw = s"$root/flags"

    val benchDocs = Seq(
      BloomDoc(0L, "alpha beta gamma delta epsilon zeta eta theta"),
      BloomDoc(50L, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
      .toDF("doc_id", "text")
    val bench = TextDedup.shingleRowsFor(benchDocs)
      .select(col("h1"), col("h2")).distinct()
    val words = BloomOps.buildWords(bench)

    val cleanA = BloomDoc(1L, "one two three four five six seven eight nine")
    val cleanB = BloomDoc(2L, "red green blue cyan magenta yellow black white")
    val leaked = BloomDoc(3L, "intro words then beta gamma delta epsilon zeta outro")

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      BloomOps.screen(TextDedup.shingleRowsFor(batch), words)
        .filter(col("flagged"))
        .select(col("doc_id"), col("h1"))
        .write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[BloomDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(cleanA); q.processAllAvailable()
      mem.addData(leaked, cleanB); q.processAllAvailable()
    } finally q.stop()

    def report(): Map[Long, Long] =
      s.read.option("basePath", raw).parquet(raw)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap

    val streamed = report()
    // the leaked doc MUST alarm (no false negatives); its run
    // 'beta..zeta' carries 3 of the eval doc's 3-grams
    assert(streamed.contains(3L), streamed.toString)
    assert(streamed(3L) >= 3L)

    // replayed batch id: idempotent overwrite, nothing changes
    sinkBody(Seq(leaked, cleanB).toDF("doc_id", "text"), 1L)
    assert(report() == streamed, "replayed batch must be a no-op")

    // streaming == batch: same docs through the batch screen in one go
    val allDocs = Seq(cleanA, leaked, cleanB).toDF("doc_id", "text")
    val batchRep = BloomOps.screen(TextDedup.shingleRowsFor(allDocs), words)
      .filter(col("flagged"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(batchRep == streamed, "streaming store and batch screen disagree")

    // and the screen never misses a TRUE benchmark shingle in the stream
    val benchH = bench.select(col("h1")).distinct().withColumn("bhit", lit(1))
    val misses = BloomOps.screen(TextDedup.shingleRowsFor(allDocs), words)
      .join(benchH, Seq("h1"), "left")
      .filter(col("bhit").isNotNull && !col("flagged")).count()
    assert(misses === 0L)
  }
}
