package graft.ingest

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** Small-files compaction for the streaming sink's output.
  *
  * The idempotent sink writes one directory per micro-batch (batch_id=N),
  * which is correct but accumulates files proportional to trigger count —
  * the classic streaming small-files problem at scale. Compaction rewrites
  * a table directory into `targetFiles` parquet files and swaps it in with
  * directory renames, so readers only ever see the old layout or the new
  * one. Run it out-of-band (the reference had no equivalent; its CSV spill
  * files were deleted after insert).
  *
  * At cluster scale the same pattern runs against object storage with a
  * manifest/table format (Delta/Iceberg `OPTIMIZE`); the rename-swap here
  * is the filesystem-native equivalent.
  */
object Compact {

  /** Rewrite `tableDir` into `targetFiles` files. Returns rows compacted.
    * The batch_id partition column (if present) is preserved as a regular
    * column so replay bookkeeping survives compaction. */
  def compactTable(spark: SparkSession, tableDir: String, targetFiles: Int): Long = {
    require(targetFiles > 0, "targetFiles must be positive")
    val src = Paths.get(tableDir)
    require(Files.isDirectory(src), s"no such table dir: $tableDir")
    val tmp = Paths.get(tableDir + ".compact.tmp")
    val old = Paths.get(tableDir + ".compact.old")

    val df = spark.read.parquet(tableDir)
    val n = df.count()
    df.repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)

    // swap: current → .old, tmp → current, drop .old
    Files.move(src, old, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, src, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        Files.move(old, src, StandardCopyOption.ATOMIC_MOVE) // roll back
        throw e
    }
    deleteRecursively(old)
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
