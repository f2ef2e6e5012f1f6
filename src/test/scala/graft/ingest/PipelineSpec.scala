package graft.ingest

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.functions.SnappyDecode

// top-level so the MemoryStream encoder can codegen: a suite-nested case
// class has no reachable outer instance, forcing Catalyst into the
// interpreted-encoder fallback (a WARN per test run and an untested
// codegen path through the ingest pipeline)
private[ingest] case class Msg(topic: String, value: Array[Byte])

/** End-to-end streaming test (SURVEY.md §5.2): memory source → snappy
  * decode → parse → route to two destination tables → parquet sink, with
  * dead-lettering of corrupt payloads and metrics parity (each bad record
  * counted once — the reference double-counted, §2.1 notes). */
class PipelineSpec extends SparkSpec {

  private def enc(json: String): Array[Byte] =
    SnappyDecode.compress(json.getBytes("UTF-8"))

  test("two-topic ingest: routing, casts, dead-letter, drain") {
    val s = spark
    import s.implicits._

    val root = Files.createTempDirectory("graft-pipe").toString
    val cfg = EngineConfig(
      topics = Seq(
        TopicConfig("t.users", "users", "uid\tInt64\t\t\nname\tString\t\t"),
        TopicConfig("t.temps", "temps", "celsius\tFloat64\t\t\nsensor\tString\t\t")),
      poolTimeoutMs = 100L,
      tableRoot = s"$root/tables",
      deadLetterRoot = s"$root/dead",
      checkpointRoot = s"$root/ckpt")

    val mem = MemoryStream[Msg](s)
    mem.addData(
      Msg("t.users", enc("""{"uid": 1, "name": "ada"}""")),
      Msg("t.users", enc("""{"uid": 2, "name": "bob", "extra": true}""")),
      Msg("t.temps", enc("""{"sensor": "s1", "celsius": 21.5}""")),
      Msg("t.temps", Array[Byte](9, 9, 9)), // corrupt snappy → dead-letter
      Msg("t.temps", enc("""not json at all""")) // corrupt JSON → dead-letter
    )

    // The good/bad counts must ride the sink's write job (df.observe), not
    // run as a separate aggregation job per topic per batch: record every
    // job's call site and later assert no collect-style counting job ran.
    val jobSites = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val jobListener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobSites.add(String.valueOf(j.properties.getProperty("callSite.short")))
    }
    s.sparkContext.addSparkListener(jobListener)

    val (query, metrics) = Pipeline.start(s, cfg, mem.toDF())
    Pipeline.drainOnShutdown(query)
    query.processAllAvailable()
    query.stop()
    // Listener events are delivered asynchronously: drain the bus before
    // asserting, or a still-queued job-start from a regressed counting job
    // could be missed and the guard would silently false-pass. Run a
    // sentinel job with a known call site and wait for it — the bus is
    // FIFO, so once the sentinel arrived every earlier event has too.
    import scala.jdk.CollectionConverters._
    s.sparkContext.setCallSite("sentinel-drain")
    try s.range(1).count() finally s.sparkContext.clearCallSite()
    val drainDeadline = System.currentTimeMillis() + 30000
    while (!jobSites.asScala.exists(_.contains("sentinel-drain")) &&
        System.currentTimeMillis() < drainDeadline)
      Thread.sleep(20)
    s.sparkContext.removeSparkListener(jobListener)
    assert(jobSites.asScala.exists(_.contains("sentinel-drain")),
      s"listener bus failed to drain within 30s: $jobSites")
    // "head at Pipeline" is the observe() TIMEOUT fallback's call site:
    // in this test the listener event must always deliver, so the
    // fallback firing at all means the observation wiring regressed.
    assert(!jobSites.asScala.exists(site =>
      site.contains("first at Pipeline") || site.contains("count at Pipeline") ||
        site.contains("head at Pipeline")),
      s"per-batch counting spawned its own job: $jobSites")

    // batch_id is the idempotence partition key the sink writes under
    val users = s.read.parquet(s"$root/tables/users").drop("batch_id")
    assert(users.columns.toSeq == Seq("name", "uid")) // alphabetical
    assert(users.count() == 2)
    assert(users.where("uid = 1").collect().head.getString(0) == "ada")

    val temps = s.read.parquet(s"$root/tables/temps").drop("batch_id")
    assert(temps.columns.toSeq == Seq("celsius", "sensor"))
    assert(temps.count() == 1)

    val dead = s.read.parquet(s"$root/dead/temps")
    assert(dead.count() == 2) // one bad snappy + one bad JSON, once each

    val snap = metrics.snapshot
    assert(snap("users") == (2L, 0L))
    assert(snap("temps") == (1L, 2L))
  }

  test("projectTopic helper filters, parses, and sorts columns") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("t.x", """{"b": "one", "a": 2}"""),
      ("t.y", """{"b": "other-topic", "a": 3}"""))
      .toDF("topic", "json")
    val tc = TopicConfig("t.x", "x", "b\tString\t\t\na\tInt32\t\t")
    val out = Pipeline.projectTopic(df, tc)
    assert(out.columns.toSeq == Seq("a", "b"))
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 2)
  }
}
