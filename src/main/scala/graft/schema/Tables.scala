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

  /** Memoized loader plans, keyed (session, dir, table). `spark.read
    * .parquet` builds a fresh InMemoryFileIndex and re-reads the footer
    * schema on EVERY call — pure driver-side latency that the ~350-query
    * bench pays hundreds of times over (`views` alone re-lists all 10
    * tables per SQL-surface query). A DataFrame is an immutable lazy plan,
    * so handing every caller the same instance only dedupes the listing/
    * schema work (the optimization guide's "file listing cached per
    * session", §6) — no data is cached and nothing about execution
    * changes. The testdata dirs are immutable by contract (TESTDATA.md);
    * a caller that mutates files under a dir mid-session must go through
    * a fresh session (or [[invalidate]]). */
  private val loaded =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Drop memoized loaders for a session — wired into CacheRegistry.clear
    * so end-of-run teardown releases the session reference. */
  def invalidate(spark: SparkSession): Unit =
    loaded.keys.filter(_._1 eq spark).foreach(loaded.remove)

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.getOrElseUpdate((spark, dir, name), load(spark, dir, name))

  /** [[t]] spread to the session's parallelism dial for CPU-heavy
    * per-row work (codec seams, tokenization) — the optimization guide's
    * §2.5 fix for unsplittable inputs, applied adaptively. The driver's
    * parquet ships ONE row group per file, so a scan is at most one task
    * per file no matter what `maxPartitionBytes` says, and every fused
    * scan+decode stage was running single-threaded. When the scan
    * already yields at least `spark.sql.shuffle.partitions` splits (any
    * real deployment — that conf is sized to the cluster), this is the
    * identity: no extra exchange ever reaches a large-scale plan. The
    * round-robin repartition is retry-safe (sortBeforeRepartition is on
    * by default) and the probe costs one plan construction, memoized per
    * (session, dir, table).
    *
    * Use ONLY where downstream work is per-row (map/flatMap seams) or
    * order-immune aggregation: a double sum/avg taken directly over the
    * spread frame would see a different partial-aggregation order than
    * the single-split scan. */
  def tSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.getOrElseUpdate((spark, dir, s"$name#spread"), {
      val base = t(spark, dir, name)
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      if (base.rdd.getNumPartitions >= parts) base
      else base.repartition(parts)
    })

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
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
