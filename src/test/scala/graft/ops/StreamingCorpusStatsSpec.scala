package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class CorpusDoc(doc_id: Long, text: String)

/** q259's streaming composition: corpus-scaling-law audits run while the
  * corpus ACCRETES, so the natural streaming shape is the accumulated-
  * store refresh idiom (StreamingQuantileSpec) — per-batch document rows
  * land under the batch_id-keyed idempotent store and each refresh
  * recomputes the Heaps fit over everything landed so far. The refresh
  * must equal the batch run over the same document set bit-for-bit (the
  * fit is a deterministic function of the multiset — exact DECIMAL
  * moments over 9dp-rounded lns), and a replayed batch must change
  * nothing. */
class StreamingCorpusStatsSpec extends SparkSpec {

  test("per-refresh Heaps fit over the accumulated store equals the batch answer across replay") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-corpus").toString
    val raw = s"$root/raw"

    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa")
    def docRows(seed: Int, n: Int, base: Int): Seq[CorpusDoc] =
      (0 until n).map { i =>
        val words = (0 until 24).map(j => vocab((i * 7 + j * (seed + 3) + j * j) % vocab.size))
        CorpusDoc((base + i).toLong, words.mkString(" "))
      }
    val b1 = docRows(0, 60, 0)
    val b2 = docRows(1, 60, 60)
    val b3 = docRows(2, 60, 120)

    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[CorpusDoc](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def fit(df: DataFrame): Seq[org.apache.spark.sql.Row] = {
      val r = CorpusStats.heapsFrame(s, df).collect().toSeq
      assert(r.size == 1)
      r
    }

    val streamed = fit(s.read.parquet(raw).select("doc_id", "text"))
    val batch = fit((b1 ++ b2 ++ b3).toDF())
    assert(streamed == batch,
      s"refresh over the accumulated store diverged from batch:\n$streamed\nvs\n$batch")
    // the fit is exercised, not degenerate: 8 checkpoints, positive slope
    assert(batch.head.getLong(0) == 8)
    assert(batch.head.getDouble(3) > 0.0 && batch.head.getDouble(3) < 1.0)

    // replay batch 1 (crash between sink write and offset commit)
    sinkBody(b2.toDF(), 1L)
    val replayed = fit(s.read.parquet(raw).select("doc_id", "text"))
    assert(replayed == batch, "replayed batch changed the refresh answer")
  }
}
