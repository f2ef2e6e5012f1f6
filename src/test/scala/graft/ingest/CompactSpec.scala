package graft.ingest

import java.nio.file.Files
import graft.SparkSpec
import graft.functions.SnappyDecode

/** Compaction after streamed ingest: many per-batch files collapse to the
  * target count with identical data, and the swap leaves no temp dirs. */
class CompactSpec extends SparkSpec {

  test("compaction preserves rows and reduces file count") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-compact").toString
    val cfg = EngineConfig(
      topics = Seq(TopicConfig("t.m", "m", "v\tInt64\t\t")),
      tableRoot = s"$root/tables",
      deadLetterRoot = s"$root/dead",
      checkpointRoot = s"$root/ckpt")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Array[Byte])](s)
    val (q, _) = Pipeline.start(s, cfg,
      mem.toDF().toDF("topic", "value"))
    try {
      // several micro-batches → several batch_id dirs
      (1 to 4).foreach { i =>
        mem.addData(("t.m", SnappyDecode.compress(s"""{"v": $i}""".getBytes("UTF-8"))))
        q.processAllAvailable()
      }
    } finally q.stop()

    val dir = s"$root/tables/m"
    val before = s.read.parquet(dir).select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(before == Seq(1L, 2L, 3L, 4L))

    val n = Compact.compactTable(s, dir, targetFiles = 1)
    assert(n == 4)
    val after = s.read.parquet(dir)
    assert(after.select("v").collect().map(_.getLong(0)).sorted.toSeq == before)
    assert(after.columns.contains("batch_id")) // bookkeeping survives
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
    assert(!new java.io.File(dir + ".compact.tmp").exists())
    assert(!new java.io.File(dir + ".compact.old").exists())
  }
}
