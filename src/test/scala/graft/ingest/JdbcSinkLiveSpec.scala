package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

// top-level for a codegen'd Encoder
case class SinkRow(event_id: Long, user_id: Long, value: Double, kind: String)

/** S14 driven against a LIVE JDBC endpoint. No ClickHouse is reachable
  * in this sandbox (NEXT.md, every round), but Spark ships embedded
  * Derby for the Hive metastore — a real ANSI database behind the real
  * JDBC protocol — so the whole Spark JDBC write path (driver loading,
  * DDL-on-append, batched INSERTs, read-back) is exercisable in-JVM.
  * What this does NOT cover vs ClickHouse: the clickhouse-jdbc dialect
  * and ReplacingMergeTree-side dedup; those remain environment-blocked.
  *
  * Pins: batch write creates + appends; the streaming foreachBatch
  * adapter lands every micro-batch; a replayed batch APPENDS (JDBC
  * append is not idempotent — the documented contract pairs the sink
  * with an idempotent receiving table), and the batch_id discipline
  * makes the downstream dedup exact. */
class JdbcSinkLiveSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftsink;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def readTable(table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(opts).load()

  test("batch write lands rows in a real JDBC database and reads back") {
    import spark.implicits._
    val rows = Seq(SinkRow(1L, 10L, 1.5, "click"),
      SinkRow(2L, 11L, 2.5, "view"), SinkRow(3L, 10L, 3.5, "click"))
    JdbcSink.write(rows.toDF(), url, "events_batch", opts)
    val back = readTable("events_batch").as[SinkRow].collect().toSet
    assert(back === rows.toSet)
    // append really appends
    JdbcSink.write(Seq(SinkRow(4L, 12L, 4.5, "view")).toDF(),
      url, "events_batch", opts)
    assert(readTable("events_batch").count() === 4)
  }

  test("streaming foreachBatch adapter: micro-batches land; replay appends") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-jdbc-sink").toString
    val mem = MemoryStream[SinkRow](s)
    // the documented contract: the CALLER stamps batch_id so an
    // idempotent receiving table (ReplacingMergeTree on ClickHouse) can
    // collapse replays — emulated downstream here with a dedup read
    val writer: (DataFrame, Long) => Unit = (df, batchId) =>
      JdbcSink.write(
        df.withColumn("batch_id",
          org.apache.spark.sql.functions.lit(batchId)),
        url, "events_stream", opts)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(writer)
      .start()
    try {
      mem.addData(SinkRow(1L, 10L, 1.0, "a"), SinkRow(2L, 11L, 2.0, "b"))
      q.processAllAvailable()
      mem.addData(SinkRow(3L, 12L, 3.0, "c"))
      q.processAllAvailable()
      val t = readTable("events_stream")
      assert(t.count() === 3)
      assert(t.select("batch_id").distinct().count() === 2)

      // replay batch 1's payload under its original batch_id: JDBC append
      // duplicates the rows...
      writer(Seq(SinkRow(3L, 12L, 3.0, "c")).toDF(), 1L)
      assert(readTable("events_stream").count() === 4)
      // ...and the batch_id discipline collapses them exactly
      val deduped = readTable("events_stream")
        .dropDuplicates("batch_id", "event_id")
      assert(deduped.count() === 3, "batch_id dedup must collapse the replay")
    } finally q.stop()
  }
}
