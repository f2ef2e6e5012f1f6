package graft.ingest

import java.nio.file.Files
import graft.SparkSpec
import graft.functions.SnappyDecode

/** S12 manual replay: recoverable dead letters land in the destination
  * table under a replay partition; permanently-bad payloads stay in the
  * (rewritten) dead-letter store. */
class ReplaySpec extends SparkSpec {

  test("replay recovers transient dead letters and keeps permanent ones") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-replay").toString
    val tc = TopicConfig("t.m", "m", "v\tInt64\t\t")
    val cfg = EngineConfig(
      topics = Seq(tc),
      tableRoot = s"$root/tables",
      deadLetterRoot = s"$root/dead",
      checkpointRoot = s"$root/ckpt",
      metricsPort = 0)

    // live run: one good row, two permanently-bad payloads → dead letters
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Array[Byte])](s)
    val (q, _) = Pipeline.start(s, cfg, mem.toDF().toDF("topic", "value"))
    try {
      mem.addData(
        ("t.m", SnappyDecode.compress("""{"v": 1}""".getBytes("UTF-8"))),
        ("t.m", Array[Byte](9, 9, 9)), // permanent: corrupt snappy
        ("t.m", SnappyDecode.compress("not json".getBytes("UTF-8")))) // permanent: bad JSON
      q.processAllAvailable()
    } finally q.stop()
    assert(s.read.parquet(s"$root/dead/m").count() == 2)

    // simulate a transiently-failed payload that was dead-lettered (e.g. a
    // sink outage): a perfectly decodable message parked in the store
    Seq(("t.m", SnappyDecode.compress("""{"v": 42}""".getBytes("UTF-8"))))
      .toDF("topic", "value")
      .write.mode("append").parquet(s"$root/dead/m/batch_id=manual")

    val (recovered, stillBad) = Replay.replayTable(s, cfg, tc)
    assert(recovered == 1L && stillBad == 2L)

    // the recovered row is in the table, under a replay partition
    val vals = s.read.parquet(s"$root/tables/m").select("v")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(1L, 42L))
    assert(new java.io.File(s"$root/tables/m/batch_id=replay-1").isDirectory)

    // dead-letter store rewritten: only the two permanent failures remain
    assert(s.read.parquet(s"$root/dead/m").count() == 2)
    // a second replay recovers nothing and is idempotent
    assert(Replay.replayTable(s, cfg, tc) == (0L, 2L))
    assert(s.read.parquet(s"$root/tables/m").count() == 2)
  }
}
