package graft.ingest

import java.nio.file.Files
import graft.SparkSpec
import graft.functions.SnappyDecode

/** S19 HTTP observability surface: scrape `/metrics` (Prometheus text
  * format, the reference's instrument names) and `/status` during a
  * MemoryStream-driven pipeline run. */
class MetricsServerSpec extends SparkSpec {

  private def httpGet(url: String): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
    try src.mkString finally { src.close(); conn.disconnect() }
  }

  test("pipeline metrics are scrapeable over HTTP while streaming") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-metrics").toString
    val cfg = EngineConfig(
      topics = Seq(TopicConfig("t.m", "m", "v\tInt64\t\t")),
      tableRoot = s"$root/tables",
      deadLetterRoot = s"$root/dead",
      checkpointRoot = s"$root/ckpt")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Array[Byte])](s)
    val (q, metrics) = Pipeline.start(s, cfg, mem.toDF().toDF("topic", "value"))
    // port 0 = ephemeral: ask the server what it actually bound
    val server = MetricsServer.start(metrics, port = 0)
    val port = server.getAddress.getPort
    try {
      mem.addData(("t.m", SnappyDecode.compress("""{"v": 1}""".getBytes("UTF-8"))))
      mem.addData(("t.m", Array[Byte](9, 9, 9))) // bad snappy → dead-letter
      q.processAllAvailable()

      val prom = httpGet(s"http://127.0.0.1:$port/metrics")
      assert(prom.contains("# TYPE kafka_consumer_msg counter"))
      assert(prom.contains("""kafka_consumer_msg{topic="m",stage="projected"} 1"""))
      assert(prom.contains("""kafka_consumer_msg_error{table="m",type="parse"} 1"""))
      assert(prom.contains("# TYPE dumps_time_insert histogram"))
      // one observation per micro-batch; the batch split of two addData
      // calls isn't pinned, so assert presence rather than an exact count
      assert(prom.contains("""dumps_time_insert_bucket{table="m",le="+Inf"}"""))
      assert(prom.contains("""dumps_time_insert_count{table="m"}"""))

      val status = httpGet(s"http://127.0.0.1:$port/status")
      assert(status.contains("m - 1 / 1")) // processed / errors

      // the streaming listener fed trigger durations + input rows
      // (listener events are async — wait briefly for delivery)
      val deadline = System.nanoTime() + 10e9.toLong
      var promL = prom
      while (!promL.contains("query:graft-ingest") && System.nanoTime() < deadline) {
        Thread.sleep(100)
        promL = httpGet(s"http://127.0.0.1:$port/metrics")
      }
      assert(promL.contains("""dumps_time_insert_count{table="query:graft-ingest"}"""))
      assert(promL.contains("""kafka_consumer_msg{topic="graft-ingest"}"""))
    } finally {
      server.stop(0)
      q.stop()
    }
  }

  test("histogram renders cumulative linear 0-60s buckets like the reference") {
    val h = new IngestMetrics.Histo
    h.observe(0.0)   // le="0"
    h.observe(0.4)   // le="1"
    h.observe(2.0)   // le="2"
    h.observe(99.0)  // +Inf
    val out = h.render("t")
    assert(out.contains("""dumps_time_insert_bucket{table="t",le="0"} 1"""))
    assert(out.contains("""dumps_time_insert_bucket{table="t",le="1"} 2"""))
    assert(out.contains("""dumps_time_insert_bucket{table="t",le="2"} 3"""))
    assert(out.contains("""dumps_time_insert_bucket{table="t",le="59"} 3"""))
    assert(out.contains("""dumps_time_insert_bucket{table="t",le="+Inf"} 4"""))
    assert(out.contains("""dumps_time_insert_count{table="t"} 4"""))
    assert(out.contains("""dumps_time_insert_sum{table="t"} 101.4"""))
  }
}
