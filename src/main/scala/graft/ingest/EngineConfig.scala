package graft.ingest

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Typed engine configuration, mirroring the reference's JSON config model
  * (`/root/reference/cmd/configStructure/configStructures.go:1-30`,
  * `config/config-example.json`) with the same defaulting rules
  * (`cmd/kafka-consumer/prepare-functions.go:82-102`):
  * pool_timeout→500 ms, flush_count→1000, flush_interval→300 s.
  *
  * Deliberate upgrades (SURVEY.md §7.5): `flushIntervalSeconds` actually
  * fires here (the reference parses it but never uses it — dead config,
  * `internal/collector/collector.go:38`) because Spark's processing-time
  * trigger is the time-based flush; `write_timeout` and `to` were dead in
  * the reference and are dropped.
  */
final case class TopicConfig(
    topic: String,
    table: String,
    /** ClickHouse DESCRIBE TSV (name\ttype\t...) defining the projection. */
    describeTsv: String,
    flushCount: Long = 1000L)

final case class EngineConfig(
    topics: Seq[TopicConfig],
    /** Opaque consumer options passed through with the `kafka.` prefix —
      * the reference's `consumer_config` map passthrough (S1). */
    consumerOptions: Map[String, String] = Map.empty,
    poolTimeoutMs: Long = 500L,
    flushIntervalSeconds: Long = 300L,
    /** Destination root: one parquet table dir per TopicConfig.table. */
    tableRoot: String = "/tmp/graft/tables",
    /** Dead-letter root for undecodable records (S12's kept-on-error dump). */
    deadLetterRoot: String = "/tmp/graft/dead",
    checkpointRoot: String = "/tmp/graft/checkpoint",
    /** Optional JDBC destination (S14); health-checked at startup (S17). */
    jdbcUrl: Option[String] = None,
    /** Port for the `/metrics` + `/status` HTTP surface (S19); <= 0
      * disables the server. The reference hardcodes :8080. */
    metricsPort: Int = 8080) {

  def withDefaults: EngineConfig = copy(
    poolTimeoutMs = if (poolTimeoutMs <= 0) 500L else poolTimeoutMs,
    flushIntervalSeconds = if (flushIntervalSeconds <= 0) 300L else flushIntervalSeconds,
    topics = topics.map(t => if (t.flushCount <= 0) t.copy(flushCount = 1000L) else t))
}

object EngineConfig {
  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def fromJson(json: String): EngineConfig = {
    val cfg = mapper.readValue(json, classOf[EngineConfig])
    require(cfg.topics.nonEmpty, "config must define at least one topic")
    cfg.withDefaults
  }

  def fromFile(path: String): EngineConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
