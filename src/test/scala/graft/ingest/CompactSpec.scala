package graft.ingest

import java.nio.file.Files
import graft.SparkSpec
import graft.functions.SnappyDecode

/** Compaction after streamed ingest: many per-batch files collapse to the
  * target count with identical data, the layout stays partition-discovery-
  * compatible with the live sink, and replayed batches below the compaction
  * watermark are skipped instead of re-appended. */
class CompactSpec extends SparkSpec {

  private def cfgFor(root: String) = EngineConfig(
    topics = Seq(TopicConfig("t.m", "m", "v\tInt64\t\t")),
    tableRoot = s"$root/tables",
    deadLetterRoot = s"$root/dead",
    checkpointRoot = s"$root/ckpt",
    metricsPort = 0)

  private def push(mem: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Array[Byte])],
      q: org.apache.spark.sql.streaming.StreamingQuery, vals: Range): Unit =
    vals.foreach { i =>
      mem.addData(("t.m", SnappyDecode.compress(s"""{"v": $i}""".getBytes("UTF-8"))))
      q.processAllAvailable()
    }

  test("compaction preserves rows, reduces files, and keeps the table readable with a live sink") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-compact").toString
    val cfg = cfgFor(root)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Array[Byte])](s)
    val (q, _) = Pipeline.start(s, cfg, mem.toDF().toDF("topic", "value"))
    try {
      push(mem, q, 1 to 4) // several micro-batches → several batch_id dirs

      val dir = s"$root/tables/m"
      val before = s.read.parquet(dir).select("v").collect().map(_.getLong(0)).sorted.toSeq
      assert(before == Seq(1L, 2L, 3L, 4L))

      // highest numeric batch_id actually on disk (trigger bookkeeping may
      // or may not produce consecutive ids — read, don't assume)
      def maxDirId: Long = new java.io.File(dir).listFiles()
        .map(_.getName).collect {
          case n if n.startsWith("batch_id=") && !n.contains("compacted") =>
            n.stripPrefix("batch_id=").toLong
        }.max
      val maxBefore = maxDirId

      val n = Compact.compactTable(s, dir, targetFiles = 1)
      assert(n == 4)
      val after = s.read.parquet(dir)
      assert(after.select("v").collect().map(_.getLong(0)).sorted.toSeq == before)
      assert(after.columns.contains("batch_id")) // bookkeeping survives
      // all data now under one reserved partition dir with one file
      val compDir = new java.io.File(dir, "batch_id=compacted-1")
      assert(compDir.isDirectory)
      assert(compDir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
      assert(!new java.io.File(dir + ".compact.tmp").exists())
      assert(!new java.io.File(dir + ".compact.old").exists())
      // watermark marker: highest numeric batch id folded in
      assert(Compact.maxCompactedBatchId(dir) == maxBefore)

      // the live sink keeps writing batch_id=N dirs next to the compacted
      // partition — the table must stay readable (mixed layout was the bug)
      push(mem, q, 5 to 6)
      val mixed = s.read.parquet(dir)
      assert(mixed.select("v").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L, 6L))
      // and a second compaction over the mixed layout still works
      val maxBefore2 = maxDirId
      assert(Compact.compactTable(s, dir, targetFiles = 1) == 6)
      assert(Compact.maxCompactedBatchId(dir) == maxBefore2)
    } finally q.stop()
  }

  test("replayed batches below the compaction watermark are skipped; a checkpoint reset is not mistaken for replay") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-compact-replay").toString
    val cfg = cfgFor(root)
    val dir = s"$root/tables/m"
    val idFile = new java.io.File(cfg.checkpointRoot, "_graft_id")

    val mem1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Array[Byte])](s)
    val (q1, _) = Pipeline.start(s, cfg, mem1.toDF().toDF("topic", "value"))
    try push(mem1, q1, 1 to 3) finally q1.stop()
    assert(Compact.compactTable(s, dir, targetFiles = 1) == 3)

    // TRUE replay: same checkpoint identity, batch ids restart and
    // re-deliver already-folded data (keep _graft_id, wipe the offsets)
    val savedId = java.nio.file.Files.readAllBytes(idFile.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cfg.checkpointRoot))
    new java.io.File(cfg.checkpointRoot).mkdirs()
    java.nio.file.Files.write(idFile.toPath, savedId)
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Array[Byte])](s)
    val (q2, m2) = Pipeline.start(s, cfg, mem2.toDF().toDF("topic", "value"))
    try push(mem2, q2, 1 to 3) finally q2.stop()

    // no duplicates: the replayed batches were skipped, data unchanged
    val vals = s.read.parquet(dir).select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(1L, 2L, 3L))
    assert(m2.snapshot.get("m").forall(_._1 == 0L)) // nothing re-counted

    // CHECKPOINT RESET: identity changes, so the watermark must be
    // discarded, the old epoch's numeric batch dirs quarantined (new
    // batch 0 must not overwrite old batch 0; a later compaction must not
    // fold stale ids into its watermark), and the "replayed-looking"
    // batches processed as new data (no-data-loss over duplicates).
    // Plant an uncompacted old-epoch batch dir with a high id:
    Seq(99L).toDF("v").write.parquet(s"$dir/batch_id=7")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cfg.checkpointRoot))
    val mem3 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Array[Byte])](s)
    val (q3, m3) = Pipeline.start(s, cfg, mem3.toDF().toDF("topic", "value"))
    try push(mem3, q3, 4 to 5) finally q3.stop()
    val names = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    info("table dir after reset: " + names.mkString(", "))
    val after = s.read.parquet(dir).select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == Seq(1L, 2L, 3L, 4L, 5L, 99L)) // nothing dropped, incl. orphan
    assert(m3.snapshot("m")._1 == 2L)
    assert(Compact.maxCompactedBatchId(dir) == -1L) // stale marker cleared
    assert(names.exists(_.startsWith("batch_id=orphan-")), s"old epoch not quarantined: $names")
    assert(names.contains("batch_id=0") && names.contains("batch_id=1"))

    // a compaction AFTER the reset derives its watermark from the new
    // epoch's ids only (not the planted stale id 7): batches 2+ of the
    // current epoch would never be mistaken for replays
    assert(Compact.compactTable(s, dir, targetFiles = 1) == 6)
    assert(Compact.maxCompactedBatchId(dir) == 1L) // new epoch wrote 0 and 1
  }
}
