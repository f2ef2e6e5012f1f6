package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * Scale notes (100 TB design intent): every query takes the table directory
  * as a parameter, so the same code runs against a partitioned data lake
  * (`dir` = a prefix with thousands of parquet files) unchanged. We always
  * go through `spark.read.parquet` so Catalyst's vectorized reader, filter
  * pushdown, and column pruning apply; nothing is cached or collected here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should be broadcast in joins at any scale.
    * region/nation are bounded by geography (25/5 rows at every SF);
    * supplier/part/customer grow with SF but stay dimension-sized relative
    * to the fact tables (orders/lineitem/events). */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects outright
      // (PARQUET_TYPE_ILLEGAL). Read it as a nanos Long and truncate to
      // microsecond timestamps — the same truncation DuckDB applies, so the
      // oracle sees identical values. All graft-owned session builders set
      // this conf at construction; the set here covers externally-built
      // sessions. It is deliberately NOT save/restored around the read:
      // the scan captures the conf lazily at action time, so a restore
      // would break execution of the returned (lazy) DataFrame. The conf
      // stays set for the session's lifetime — any later nanos-timestamp
      // parquet reads in the same session also get the legacy Long shape.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      // integer DIV, not `/`: long/int division goes through double and
      // rounds the microsecond up at ~1.7e18 ns magnitudes
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries (grouping
    * sets, SQL-only surfaces) can run against the same inputs. */
  def views(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
