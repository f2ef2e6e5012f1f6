package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver calls with exactly (sfDir, outDir); extra args are an optional
    // local-iteration name filter (prefix match) and change nothing for the
    // driver's 2-arg invocation
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionDefaults.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Conf knobs whose REGISTERED oracles are statically generated at the
    // default value (the SQL text can't read a runtime conf): a session
    // that inherits a non-default (spark-defaults.conf, a wrapper script)
    // would make the strict compare silently wrong — q292–q295 would run
    // the widened PQ geometry against the 8/64 oracle (ADVICE r11). Fail
    // loudly before any query runs; sweeps that set these knobs go through
    // ScaleBench / the internal frames, never through Verify.
    Seq("graft.pq.m" -> "8", "graft.pq.k" -> "64", "graft.pq.nprobe" -> "2",
      "graft.minhash.hashes" -> "8", "graft.minhash.bandRows" -> "2")
      .foreach { case (k, d) =>
        val v = spark.conf.getOption(k)
        require(v.forall(_.trim == d), s"$k=${v.getOrElse("")} but the " +
          s"registered oracles are baked at the default $d — unset it before Verify")
      }
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val failed = scala.collection.mutable.ListBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.exists(name.startsWith) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A throwing query must NOT silently vanish from the driver's
        // CORRECTNESS artifact (round 7's 20 disappearing rows). Write a
        // one-row marker parquet so the driver's compare records a loud
        // schema/hash mismatch for this name instead of no entry at all.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name -> String.valueOf(e.getMessage)
        // best-effort: if the marker write ALSO fails (disk full, dead
        // session), the loop must still reach the remaining queries and
        // the failed.json/oracle_sql.json writes below
        try {
          import spark.implicits._
          Seq(("GRAFT_QUERY_ERROR", String.valueOf(e.getMessage).take(500)))
            .toDF("_graft_error", "_message")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name marker write failed: ${m.getMessage}")
        }
      }
    }
    // FULL runs write failed.json unconditionally (a stale copy from a
    // previous run must not survive an all-green rerun); a name-FILTERED
    // local iteration leaves it alone — rewriting it from a partial run
    // would erase the failure records of every query outside the filter
    if (only.isEmpty) {
      val lines = failed.map { case (n, m) =>
        s"${q(n)}: ${q(m)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/failed.json"), lines)
    }
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] FAILED queries: ${failed.map(_._1).mkString(", ")}")
    println(s"""{"verify_failed": ${failed.size}}""")
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.ops.CacheRegistry.clear(spark) // release every operator cache
    spark.stop()
  }
}
