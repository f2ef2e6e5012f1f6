package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Defaulting rules mirror the reference's checkConfig
  * (`/root/reference/cmd/kafka-consumer/prepare-functions.go:82-102`). */
class EngineConfigSpec extends AnyFunSuite {

  test("JSON parse with defaults applied") {
    val cfg = EngineConfig.fromJson(
      """{"topics": [{"topic": "t1", "table": "tbl1",
        |  "describeTsv": "a\tInt64\t\t", "flushCount": 0}],
        |  "poolTimeoutMs": 0, "flushIntervalSeconds": -1}""".stripMargin)
    assert(cfg.poolTimeoutMs == 500L)
    assert(cfg.flushIntervalSeconds == 300L)
    assert(cfg.topics.head.flushCount == 1000L)
    assert(cfg.topics.head.table == "tbl1")
  }

  test("consumer options pass through opaquely") {
    val cfg = EngineConfig.fromJson(
      """{"topics": [{"topic": "t", "table": "t", "describeTsv": "a\tInt64\t\t"}],
        |  "consumerOptions": {"group.id": "g1", "auto.offset.reset": "earliest"}}""".stripMargin)
    assert(cfg.consumerOptions("group.id") == "g1")
  }

  test("empty topics rejected") {
    intercept[IllegalArgumentException](EngineConfig.fromJson("""{"topics": []}"""))
  }

  test("shipped example config loads with every field bound") {
    val cfg = EngineConfig.fromFile("config/config-example.json")
    assert(cfg.topics.map(_.table) == Seq("users", "metrics"))
    assert(cfg.topics(1).flushCount == 10L)
    assert(cfg.consumerOptions("group.id") == "graft-consumer")
    assert(cfg.metricsPort == 8080)
    assert(cfg.jdbcUrl.isEmpty)
  }
}
