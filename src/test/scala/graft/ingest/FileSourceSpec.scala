package graft.ingest

import java.nio.file.Files
import graft.SparkSpec
import graft.functions.SnappyDecode

/** IngestMain's file-source (backfill/replay) mode end-to-end: staged
  * parquet of (topic, value) payloads → streaming pipeline → tables. */
class FileSourceSpec extends SparkSpec {

  test("staged-file ingest produces the same table output as live ingest") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-file").toString
    val stage = s"$root/stage"

    Seq(
      ("t.logs", SnappyDecode.compress("""{"msg": "a", "level": 1}""".getBytes("UTF-8"))),
      ("t.logs", SnappyDecode.compress("""{"msg": "b", "level": 2}""".getBytes("UTF-8"))))
      .toDF("topic", "value")
      .write.parquet(stage)

    val cfg = EngineConfig(
      topics = Seq(TopicConfig("t.logs", "logs", "msg\tString\t\t\nlevel\tInt32\t\t")),
      tableRoot = s"$root/tables",
      deadLetterRoot = s"$root/dead",
      checkpointRoot = s"$root/ckpt")

    val (query, metrics) = Pipeline.start(s, cfg, IngestMain.fileSource(s, stage))
    try {
      query.processAllAvailable()
    } finally query.stop()

    val logs = s.read.parquet(s"$root/tables/logs").drop("batch_id")
    assert(logs.columns.toSeq == Seq("level", "msg"))
    assert(logs.count() == 2)
    assert(metrics.snapshot("logs") == (2L, 0L))
  }
}
