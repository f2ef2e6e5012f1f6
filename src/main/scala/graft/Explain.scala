package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and wall time for named
  * queries — the `.explain` iteration loop the build guide demands. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SessionDefaults.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Ad-hoc conf overrides for plan experiments, e.g.
    // GRAFT_CONF="spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold=0"
    sys.env.get("GRAFT_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    args.foreach { name =>
      println(s"===== $name =====")
      // Construction is INSIDE the timer: iterative operators (q72's label
      // propagation) run Spark actions while building the DataFrame, so
      // timing only .count() under-reports them — Bench times fn+count too.
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val n = df.count()
        println(s"$name run$i: $n rows in ${String.format(java.util.Locale.ROOT,
          "%.2f", Double.box((System.nanoTime() - t0) / 1e9))} s")
        if (i == 1 && sys.env.get("GRAFT_EXPLAIN").forall(_ == "1"))
          df.explain("formatted")
      }
    }
    spark.stop()
  }
}
