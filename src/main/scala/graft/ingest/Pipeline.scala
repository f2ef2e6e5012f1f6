package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.GraftFunctions
import graft.schema.ClickHouseSchema

/** The reference's whole job as one Structured Streaming pipeline
  * (SURVEY.md §3): Kafka subscribe → snappy decode → JSON parse →
  * schema-driven sorted projection + cast → per-topic routing →
  * append sink, with checkpointed recovery and graceful drain.
  *
  * Mapping to the reference (§2.1): S1/S2 = `readStream.format("kafka")` +
  * processing-time trigger; S3 = bad-poll filter is source-internal;
  * S4–S8 = [[decoded]]; S9–S11 = per-topic filter inside `foreachBatch`
  * (every micro-batch is a flush; `maxOffsetsPerTrigger` bounds batch
  * size — the count-threshold flush, but time-driven too, which the
  * reference only pretended to do); S12 = checkpoint WAL + dead-letter
  * parquet (kept-on-error dump); S13 = Catalyst Project+Cast instead of
  * shelling out to clickhouse-local; S14 = idempotent append sink;
  * S15 = `query.stop()` in a shutdown hook.
  *
  * Scale: parallelism = Kafka partitions (no global collector mutex — the
  * reference serialized all parsing behind one lock,
  * `internal/collector/collector.go:173-174`); parse+project is per-row
  * map work inside whole-stage codegen; the only state is source offsets
  * in the checkpoint.
  */
object Pipeline {

  /** S1: multi-topic Kafka subscription; consumer options pass through with
    * the `kafka.` prefix exactly like the reference's opaque map. */
  def kafkaSource(spark: SparkSession, cfg: EngineConfig, brokers: String): DataFrame = {
    val base = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", cfg.topics.map(_.topic).mkString(","))
    cfg.consumerOptions.foldLeft(base) { case (b, (k, v)) =>
      b.option(s"kafka.$k", v)
    }.load()
  }

  /** S4–S8 on any frame with (topic: string, value: binary) columns —
    * identical code path for a streaming Kafka frame or a batch test frame.
    * Returns (topic, json, parse-ok flag, raw value for dead-lettering). */
  def decoded(df: DataFrame): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(
      col("topic"),
      col("value"),
      GraftFunctions.snappy_decode(col("value")).cast("string").as("json"))
  }

  /** S6+S13 for one topic: parse against its schema, sorted projection with
    * Catalyst casts. Rows whose JSON fails to parse come back with every
    * projected column null — callers dead-letter them (reference kept the
    * CSV dump on failed insert; we keep the raw payload). */
  /** Malformed JSON detection: PERMISSIVE `from_json` yields an all-null
    * struct (not a null struct) for bad input, so a `_corrupt_record` field
    * is the reliable reject signal — a legitimate `{}` message stays a row
    * of NULLs, a non-JSON payload is rejected, matching the reference's
    * json.Unmarshal behavior (S5). */
  private def parseWithCorrupt(df: DataFrame, tc: TopicConfig): DataFrame = {
    val schema = ClickHouseSchema.fromDescribe(tc.describeTsv)
    val parseSchema = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    df.filter(col("topic") === tc.topic)
      .withColumn("r", from_json(col("json"), parseSchema,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
  }

  private def isBad = col("json").isNull.or(col("r._corrupt_record").isNotNull)

  def projectTopic(df: DataFrame, tc: TopicConfig): DataFrame = {
    val schema = ClickHouseSchema.fromDescribe(tc.describeTsv)
    val parsed = parseWithCorrupt(df, tc)
      .filter(!isBad)
      .select(col("r.*")).drop("_corrupt_record")
    ClickHouseSchema.sortedProjectCast(parsed, schema)
  }

  /** Full job: source → decode → route per topic → parquet append, with
    * dead-letter capture, checkpointing, and a processing-time trigger at
    * the reference's poll cadence. */
  def start(spark: SparkSession, cfg: EngineConfig, source: DataFrame)
      : (StreamingQuery, IngestMetrics) = {
    val metrics = new IngestMetrics(spark)
    val query = source.writeStream
      .queryName("graft-ingest")
      .option("checkpointLocation", cfg.checkpointRoot)
      .trigger(Trigger.ProcessingTime(s"${cfg.poolTimeoutMs} milliseconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dec = decoded(batch).cache()
        try {
          cfg.topics.foreach { tc =>
            val withParsed = parseWithCorrupt(dec, tc)
            val good = withParsed.filter(!isBad)
            val bad = withParsed.filter(isBad)
            val projected = ClickHouseSchema.sortedProjectCast(
              good.select(col("r.*")).drop("_corrupt_record"),
              ClickHouseSchema.fromDescribe(tc.describeTsv))
            // Idempotent sink: each micro-batch overwrites its own
            // batch_id-keyed directory, so a replayed batch (post-crash
            // restart from checkpoint) lands on the same path instead of
            // double-appending — exactly-once output from an at-least-once
            // replay (SURVEY.md §7.5 upgrade over the reference).
            projected.write.mode("overwrite")
              .parquet(s"${cfg.tableRoot}/${tc.table}/batch_id=$batchId")
            val nBad = bad.count()
            if (nBad > 0) {
              // S12 kept-on-error dump: raw payloads, replayable later.
              bad.select(col("topic"), col("value"))
                .write.mode("append")
                .parquet(s"${cfg.deadLetterRoot}/${tc.table}")
              metrics.recordErrors(tc.table, nBad)
            }
            metrics.recordProcessed(tc.table, projected.count())
          }
        } finally dec.unpersist()
      }
      .start()
    (query, metrics)
  }

  /** S15: graceful drain — stop the query (the checkpoint already makes
    * this safe; the reference needed a synchronous flush-all). */
  def drainOnShutdown(query: StreamingQuery): Unit =
    sys.addShutdownHook {
      if (query.isActive) query.stop()
    }
}

/** S19: processed/error counters per destination table — the reference's
  * Prometheus surface (`internal/promMetrics/prom.go`), exposed as an
  * in-process snapshot (each bad record counted once, fixing the
  * reference's double-count, SURVEY.md §2.1 notes). */
final class IngestMetrics(spark: SparkSession) extends Serializable {
  import java.util.concurrent.ConcurrentHashMap
  import java.util.concurrent.atomic.LongAdder

  private val processed = new ConcurrentHashMap[String, LongAdder]()
  private val errors = new ConcurrentHashMap[String, LongAdder]()

  private def add(m: ConcurrentHashMap[String, LongAdder], k: String, n: Long): Unit =
    m.computeIfAbsent(k, _ => new LongAdder).add(n)

  def recordProcessed(table: String, n: Long): Unit = add(processed, table, n)
  def recordErrors(table: String, n: Long): Unit = add(errors, table, n)

  def snapshot: Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    (processed.keySet.asScala ++ errors.keySet.asScala).map { k =>
      k -> (Option(processed.get(k)).map(_.sum).getOrElse(0L),
        Option(errors.get(k)).map(_.sum).getOrElse(0L))
    }.toMap
  }
}
