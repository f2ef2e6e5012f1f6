package graft.ingest

import org.apache.spark.sql.DataFrame

/** S14's real destination: bulk-insert into an OLAP store over JDBC from
  * `foreachBatch` — the reference's `clickhouse-client INSERT` pipeline
  * (`/root/reference/internal/collector/collector.go:119-155`) as a Spark
  * writer. No database ships in this container, so this path is exercised
  * at compile level; `Pipeline.start` uses the parquet sink by default and
  * a caller swaps in [[foreachBatchWriter]] for a live ClickHouse:
  *
  * {{{
  * source.writeStream.foreachBatch(
  *   JdbcSink.foreachBatchWriter("jdbc:clickhouse://host:8123/db", "events",
  *     Map("user" -> "default", "batchsize" -> "10000"))).start()
  * }}}
  */
object JdbcSink {

  /** Append a micro-batch to `table`. Exactly-once on replay comes from
    * pairing this with an idempotent receiving table (e.g. ClickHouse
    * ReplacingMergeTree keyed on a batch_id column) — add the batch id
    * with `df.withColumn("batch_id", lit(batchId))` in the caller when the
    * destination deduplicates. */
  def write(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode("append")
      .save()

  /** Adapter with the exact `foreachBatch` shape. */
  def foreachBatchWriter(url: String, table: String,
      options: Map[String, String] = Map.empty): (DataFrame, Long) => Unit =
    (df, _) => write(df, url, table, options)
}
