package graft.ingest

import org.apache.spark.sql.SparkSession

/** S17: startup destination health-check. The reference HTTP-pings every
  * ClickHouse host before consuming and hard-exits on a bad answer
  * (`cmd/kafka-consumer/prepare-functions.go:104-119` — it expects the
  * native port's `400 Bad Request` + "is for clickhouse-client program"
  * fingerprint). Our destinations are a filesystem table root (default
  * sink) and optionally a JDBC store, so the probes are: the root must be
  * creatable+writable (a real write, not just an existence check — object
  * stores can list but refuse writes), and JDBC must answer `SELECT 1`.
  */
object HealthCheck {

  /** Probe a filesystem destination: create the root if needed, write and
    * delete a marker file. Left(reason) on failure. */
  def probePath(spark: SparkSession, root: String): Either[String, Unit] = {
    try {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(p)
      val marker = new org.apache.hadoop.fs.Path(p, s".graft-health-${System.nanoTime()}")
      val out = fs.create(marker, true)
      try out.write(1) finally out.close()
      fs.delete(marker, false)
      Right(())
    } catch {
      case e: Exception => Left(s"path probe failed for $root: ${e.getMessage}")
    }
  }

  /** Probe a JDBC destination with `SELECT 1` — the Spark twin of the
    * reference's native-port ping. */
  def probeJdbc(url: String, user: String = "", password: String = ""): Either[String, Unit] = {
    try {
      val props = new java.util.Properties()
      if (user.nonEmpty) props.setProperty("user", user)
      if (password.nonEmpty) props.setProperty("password", password)
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val rs = conn.createStatement().executeQuery("SELECT 1")
        if (rs.next() && rs.getInt(1) == 1) Right(())
        else Left(s"jdbc probe got no/wrong row from $url")
      } finally conn.close()
    } catch {
      case e: Exception => Left(s"jdbc probe failed for $url: ${e.getMessage}")
    }
  }

  /** All destination probes for a config: table root, dead-letter root,
    * checkpoint root, and the JDBC url when configured. */
  def checkAll(spark: SparkSession, cfg: EngineConfig): Seq[String] = {
    val pathProbes = Seq(cfg.tableRoot, cfg.deadLetterRoot, cfg.checkpointRoot)
      .map(probePath(spark, _))
    val jdbcProbe = cfg.jdbcUrl.toSeq.map(probeJdbc(_))
    (pathProbes ++ jdbcProbe).collect { case Left(reason) => reason }
  }

  /** Hard-exit on any failed probe, like the reference (`os.Exit(1)`). */
  def checkOrExit(spark: SparkSession, cfg: EngineConfig): Unit = {
    val failures = checkAll(spark, cfg)
    if (failures.nonEmpty) {
      failures.foreach(f => GraftLog.error("Destination health-check failed", f))
      sys.exit(1)
    }
    GraftLog.info("Destination health-check passed",
      s"probed ${cfg.tableRoot}, ${cfg.deadLetterRoot}, ${cfg.checkpointRoot}" +
        cfg.jdbcUrl.map(u => s", $u").getOrElse(""))
  }
}
