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
      // events.ts has shipped as both TIMESTAMP(NANOS) (which Spark 4
      // rejects outright — PARQUET_TYPE_ILLEGAL — unless nanosAsLong turns
      // it into a raw Long) and plain TIMESTAMP(MICROS). Set the conf so a
      // nanos file reads at all, then adapt to what actually came back:
      // only a Long `ts` needs the nanos→micros truncation (the same
      // truncation DuckDB applies, so the oracle sees identical values).
      // The conf is deliberately NOT save/restored around the read: the
      // scan captures it lazily at action time, so a restore would break
      // execution of the returned (lazy) DataFrame.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      import org.apache.spark.sql.types.LongType
      if (df.schema("ts").dataType == LongType)
        // integer DIV, not `/`: long/int division goes through double and
        // rounds the microsecond up at ~1.7e18 ns magnitudes
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries (grouping
    * sets, SQL-only surfaces) can run against the same inputs.
    *
    * Per-table isolation: registration of one table must not throw for a
    * query that never touches it (round 7: an events-loader bug took out 8
    * SQL-surface queries that only read region/nation). A table whose
    * *registration* fails is skipped here — the query that actually
    * references it still fails, with TABLE_OR_VIEW_NOT_FOUND naming the
    * culprit table, which is the failure we want. NonFatal only: an OOM or
    * StackOverflow during a load must propagate — a run that limps on past
    * a fatal JVM error reports undefined results. */
  def views(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      try t(spark, dir, n).createOrReplaceTempView(n)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] view registration failed for '$n': ${e.getMessage}")
      }
    }
}
