package graft.ingest

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** S12's other half: the manual-replay workflow for kept-on-error dumps.
  *
  * The reference keeps a failed batch's CSV spill on disk "for manual
  * replay" (`/root/reference/internal/collector/collector.go:132-146`) but
  * ships no tool to perform it. This is that tool for the Spark engine's
  * dead-letter parquet: re-run each kept payload through the SAME
  * decode→parse→project path the live sink uses; rows that now succeed
  * (transient failure, fixed schema, upgraded decoder) are appended to the
  * destination table under a reserved `batch_id=replay-<gen>` partition
  * (a string value like the compacted and orphan partitions — invisible
  * to the numeric replay watermark), and the dead-letter store is
  * rewritten to hold only the still-failing payloads.
  *
  * Scale: the replay is one batch job over the dead-letter store — decode
  * and parse are map-side, the only materialization is the two writes.
  */
object Replay {

  /** Replay one table's dead letters. Returns (recovered, stillBad). */
  def replayTable(spark: SparkSession, cfg: EngineConfig, tc: TopicConfig): (Long, Long) = {
    val dlDir = s"${cfg.deadLetterRoot}/${tc.table}"
    if (!Files.isDirectory(Paths.get(dlDir))) return (0L, 0L)

    val kept = spark.read.parquet(dlDir).select("topic", "value")
    val (good, bad) = Pipeline.splitGoodBad(Pipeline.decoded(kept), tc)

    val tableDir = s"${cfg.tableRoot}/${tc.table}"
    val gen = nextReplayGen(tableDir)
    val recovered = good.count()
    if (recovered > 0)
      good.write.mode("overwrite").parquet(s"$tableDir/batch_id=replay-$gen")

    // rewrite the dead-letter store with only the still-bad payloads
    // (write-to-tmp + swap, same caveat as Compact: no concurrent readers).
    // Kept rows go under a batch_id partition dir so the layout stays
    // discovery-compatible with the live sink's batch_id=N appends.
    val stillBad = bad.count()
    val tmp = Paths.get(dlDir + ".replay.tmp")
    bad.withColumn("batch_id", org.apache.spark.sql.functions.lit(s"replaykept-$gen"))
      .write.mode("overwrite").partitionBy("batch_id").parquet(tmp.toString)
    val old = Paths.get(dlDir + ".replay.old")
    Files.move(Paths.get(dlDir), old, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, Paths.get(dlDir), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        Files.move(old, Paths.get(dlDir), StandardCopyOption.ATOMIC_MOVE)
        throw e
    }
    deleteRecursively(old)
    (recovered, stillBad)
  }

  /** Replay every configured table. Returns per-table (recovered, stillBad). */
  def replayAll(spark: SparkSession, cfg: EngineConfig): Map[String, (Long, Long)] =
    cfg.topics.map(tc => tc.table -> replayTable(spark, cfg, tc)).toMap

  private def nextReplayGen(tableDir: String): Long = {
    val dir = Paths.get(tableDir)
    if (!Files.isDirectory(dir)) 1L
    else {
      val ls = Files.list(dir)
      val gens = try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .collect { case n if n.startsWith("batch_id=replay-") =>
            scala.util.Try(n.stripPrefix("batch_id=replay-").toLong).getOrElse(0L) }
          .toSeq
      } finally ls.close()
      if (gens.isEmpty) 1L else gens.max + 1L
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
