package graft.ingest

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files compaction for the streaming sink's output.
  *
  * The idempotent sink writes one directory per micro-batch (batch_id=N),
  * which is correct but accumulates files proportional to trigger count —
  * the classic streaming small-files problem at scale. Compaction rewrites
  * the table into `targetFiles` parquet files under a reserved
  * `batch_id=compacted-<gen>` partition directory, so the layout stays
  * partition-discovery-compatible with the live sink still appending
  * `batch_id=N` directories next to it. A `_graft_compacted` marker file
  * (underscore-prefixed → invisible to parquet discovery) records the
  * highest numeric batch id folded into the compacted generation; the sink
  * consults it so a checkpoint-replayed batch whose directory was compacted
  * away is skipped instead of re-appended (exactly-once survives
  * compaction).
  *
  * Swap caveat: the two renames are **not** one atomic operation — run
  * compaction when no reader is mid-scan of this table (out-of-band, like
  * any maintenance job), and on object stores without atomic rename use a
  * manifest/table format (Delta/Iceberg `OPTIMIZE`) instead; this
  * rename-swap is the filesystem-native equivalent.
  */
object Compact {

  private val MarkerName = "_graft_compacted"

  /** Highest numeric batch id already folded into a compacted generation,
    * or -1 when the table was never compacted. The sink skips replayed
    * batch ids at or below this. */
  def maxCompactedBatchId(tableDir: String): Long = {
    val marker = Paths.get(tableDir, MarkerName)
    if (Files.exists(marker))
      new String(Files.readAllBytes(marker), "UTF-8").trim.toLong
    else -1L
  }

  private def writeMarker(tableDir: String, maxBatch: Long): Unit =
    Files.write(Paths.get(tableDir, MarkerName), maxBatch.toString.getBytes("UTF-8"))

  /** Drop a table's watermark marker — called by the sink when it detects
    * the checkpoint identity changed (batch ids restarted), making the
    * recorded watermark incomparable with current batch ids. */
  def clearMarker(tableDir: String): Unit = {
    Files.deleteIfExists(Paths.get(tableDir, MarkerName))
    wmCache.remove(tableDir)
  }

  /** Quarantine a previous checkpoint epoch's numeric batch dirs by
    * renaming them to `batch_id=orphan-<epoch8>-N`. Called by the sink on
    * a proven identity change, BEFORE writing the new epoch's batches:
    * (a) the new epoch's batch 0 no longer overwrites the old epoch's
    * batch 0 (no data loss on reset), and (b) a later compaction computes
    * its numeric-max watermark over current-epoch ids only — stale ids
    * can no longer be laundered into a watermark that would skip brand-new
    * batches. Orphaned rows remain part of the table (string partition
    * values, like compacted-*). */
  def orphanNumericBatchDirs(tableDir: String, oldEpochId: String): Unit = {
    val dir = Paths.get(tableDir)
    if (Files.isDirectory(dir)) {
      val tag = oldEpochId.takeWhile(_ != '-').take(8) match {
        case "" => "unknown"
        case t => t
      }
      val ls = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.toSeq.foreach { p =>
          val n = p.getFileName.toString
          if (n.startsWith("batch_id=") &&
              n.stripPrefix("batch_id=").forall(_.isDigit) &&
              n.stripPrefix("batch_id=").nonEmpty) {
            Files.move(p, dir.resolve(
              s"batch_id=orphan-$tag-${n.stripPrefix("batch_id=")}"))
          }
        }
      } finally ls.close()
    }
  }

  /** [[maxCompactedBatchId]] behind a short-TTL cache for the sink's
    * per-batch checks (the value only changes when compaction runs).
    * Same-JVM compactions invalidate the cache immediately; a compaction
    * from a *different* process is visible within the TTL. Reads are
    * failure-proofed: any marker I/O error (e.g. a non-local path the nio
    * provider can't handle) yields -1 = no skip, never a crashed batch. */
  def cachedMaxCompactedBatchId(tableDir: String, ttlMs: Long = 10000L): Long = {
    val now = System.currentTimeMillis()
    wmCache.get(tableDir) match {
      case Some((wm, at)) if now - at < ttlMs => wm
      case _ =>
        val wm = scala.util.Try(maxCompactedBatchId(tableDir)).getOrElse(-1L)
        wmCache.put(tableDir, (wm, now))
        wm
    }
  }

  private val wmCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

  /** Rewrite `tableDir` into `targetFiles` files under a fresh
    * `batch_id=compacted-<gen>` partition. Returns rows compacted. */
  def compactTable(spark: SparkSession, tableDir: String, targetFiles: Int): Long = {
    require(targetFiles > 0, "targetFiles must be positive")
    val src = Paths.get(tableDir)
    require(Files.isDirectory(src), s"no such table dir: $tableDir")
    val tmp = Paths.get(tableDir + ".compact.tmp")
    val old = Paths.get(tableDir + ".compact.old")

    val priorMax = maxCompactedBatchId(tableDir)
    val gen = priorMax match {
      case -1L => 1L
      case _ =>
        // generations already on disk: batch_id=compacted-<g> dirs
        val s = Files.list(src)
        val gens = try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .collect { case n if n.startsWith("batch_id=compacted-") =>
              n.stripPrefix("batch_id=compacted-").toLong }
            .toSeq
        } finally s.close()
        if (gens.isEmpty) 1L else gens.max + 1L
    }

    val df = spark.read.parquet(tableDir)
    val n = df.count()
    // Highest numeric batch id being folded in (compacted-* values try_cast
    // to null — ANSI mode would throw on plain cast — and are already
    // covered by the prior marker).
    val maxRow = df.select(max(expr("try_cast(batch_id AS BIGINT)"))).head()
    val numericMax = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)

    df.withColumn("batch_id", lit(s"compacted-$gen"))
      .repartition(targetFiles)
      .write.mode("overwrite").partitionBy("batch_id").parquet(tmp.toString)
    // The watermark marker is written INTO the tmp dir before the swap so
    // it travels atomically with the compacted data: a crash between the
    // renames can lose either the whole compaction (rolled back) or
    // nothing — never the data-without-marker state that would let
    // replayed batches re-append rows already folded in.
    writeMarker(tmp.toString, math.max(priorMax, numericMax))
    // Preserve the sink's auxiliary _graft_* bookkeeping (e.g. the
    // checkpoint-identity tag) across the swap — losing it would make the
    // watermark unverifiable and disable replay skipping.
    val ls = Files.list(src)
    try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("_graft_") &&
          p.getFileName.toString != MarkerName && Files.isRegularFile(p))
        .foreach(p => Files.copy(p, tmp.resolve(p.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING))
    } finally ls.close()

    // swap: current → .old, tmp → current, drop .old (see Scaladoc caveat)
    Files.move(src, old, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, src, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        Files.move(old, src, StandardCopyOption.ATOMIC_MOVE) // roll back
        throw e
    }
    deleteRecursively(old)
    wmCache.remove(tableDir) // same-JVM sinks see the new watermark at once
    n
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
