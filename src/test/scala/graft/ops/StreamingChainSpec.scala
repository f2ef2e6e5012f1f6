package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder (a suite-nested case
// class has no reachable outer instance)
case class CurDoc(doc_id: Long, source: String, text: String)

/** A WHOLE curation chain — rule-based quality gate (q115) → exact
  * content dedup (q40's fingerprint, keep-first) → per-source keeper
  * counts (the q80/q86 planning input) — must compose with the
  * reference's continuous-ingest core, not just each operator alone
  * (StreamingCurationSpec and StreamingMinHashSpec prove the single-
  * operator cases). The chain's per-doc stage is one map-side pass
  * (ruleFlags + md5 fingerprint), so the foreachBatch body lands exactly
  * what the batch query computes for the same docs into the
  * batch_id-keyed idempotent store; the gate + dedup + count report runs
  * over the accumulated store. A duplicate spanning batches must
  * attribute the keeper to the EARLIER doc's source, a rejected doc must
  * never resurrect, and a replayed batch must be a no-op. */
class StreamingChainSpec extends SparkSpec {

  /** ≥30 distinct words incl. stopword 'the' → passes every q115 rule. */
  private def good(seed: String): String =
    "the " + (1 to 31).map(i => s"$seed$i").mkString(" ")

  /** Map-side per-doc chain record: the q115 gate plus the q40/q49
    * normalized-content fingerprint — what each micro-batch lands. */
  private def records(docs: DataFrame): DataFrame =
    TextAnalysis.ruleFlags(docs)
      .select(col("doc_id"), col("source"), col("keep"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))

  /** End-state report: gate, dedup by fingerprint keeping the smallest
    * doc_id, then count keepers per source — one shuffle on the 32-byte
    * fp, one on the tiny source key. */
  private def report(recs: DataFrame): Seq[(String, Long)] = {
    val keepers = recs.filter(col("keep") === 1L)
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("source"))).as("k"))
    keepers.groupBy(col("k.source").as("source"))
      .agg(count(lit(1)).cast("long").as("n_kept"))
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("gate → dedup → mixture report composes across micro-batches") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-chain").toString
    val store = s"$root/records"

    // batch 1: doc 1 good (srcA); doc 2 rejected (too_short, srcA)
    // batch 2: doc 3 good (srcB); doc 4 = exact duplicate of doc 1 but in
    //          srcB — the CROSS-BATCH duplicate whose keeper must stay srcA
    // batch 3: doc 5 good (srcB); doc 6 duplicate of the REJECTED doc 2 —
    //          both gated out, so neither may surface as a keeper
    val b1 = Seq(CurDoc(1L, "srcA", good("alpha")), CurDoc(2L, "srcA", "tiny doc"))
    val b2 = Seq(CurDoc(3L, "srcB", good("beta")), CurDoc(4L, "srcB", good("alpha")))
    val b3 = Seq(CurDoc(5L, "srcB", good("gamma")), CurDoc(6L, "srcB", "tiny doc"))

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      records(batch).write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[CurDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def endState(): Seq[(String, Long)] = report(
      s.read.parquet(store).select("doc_id", "source", "keep", "fp").distinct())

    val batchAnswer = report(records((b1 ++ b2 ++ b3).toDF()))
    val streamed = endState()
    assert(streamed == batchAnswer,
      s"incremental end-state diverges from the batch answer:\n$streamed\nvs\n$batchAnswer")
    // keeper attribution: alpha's keeper is doc 1 (srcA), so srcA has 1
    // keeper and srcB exactly 2 (beta, gamma — not the duplicate alpha)
    assert(streamed == Seq(("srcA", 1L), ("srcB", 2L)), s"got $streamed")

    // REPLAY batch 2 through the same sink body (checkpoint recovery after
    // a crash between sink write and offset commit): no-op for the report
    sinkBody(b2.toDF(), 1L)
    assert(endState() == batchAnswer,
      "replayed batch must not change the end-state report")
  }
}
