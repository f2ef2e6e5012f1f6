package graft.ingest

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.streaming.StreamingQueryListener

/** S19: the reference's HTTP observability surface, Spark-side.
  *
  * The reference serves Prometheus `/metrics` and a plain-text `/status`
  * page on :8080 (`cmd/kafka-consumer/prepare-functions.go:37-58`) with
  * three instruments (`internal/promMetrics/prom.go:14-44`):
  * `kafka_consumer_msg{topic,partition}`, `kafka_consumer_msg_error
  * {table,type}`, and the `dumps_time_insert{table}` histogram with linear
  * 0–60 s buckets. This module renders the same instrument names in
  * Prometheus text exposition format 0.0.4 from [[IngestMetrics]], using
  * only the JDK's built-in HTTP server (no extra dependencies).
  *
  * Scale note: metrics are driver-side aggregates (counters fed from
  * `foreachBatch` bookkeeping and the streaming listener), so the endpoint
  * costs nothing on executors and works identically on a 1000-executor
  * cluster — the driver is where Structured Streaming progress lands.
  */
object MetricsServer {

  def start(metrics: IngestMetrics, port: Int = 8080): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress(port), 0)
    srv.createContext("/metrics", textHandler(() => metrics.prometheus))
    srv.createContext("/status", textHandler(() => metrics.statusPage))
    srv.setExecutor(null) // single-threaded is plenty for a scrape endpoint
    srv.start()
    srv
  }

  private def textHandler(body: () => String): HttpHandler = new HttpHandler {
    override def handle(x: HttpExchange): Unit = {
      val bytes = body().getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
      x.sendResponseHeaders(200, bytes.length.toLong)
      val os = x.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }
}

/** Bridges Structured Streaming progress into [[IngestMetrics]]: each
  * completed micro-batch contributes its input-row count (≙ the reference's
  * `kafka_consumer_msg` counter fed per poll) and its trigger-execution
  * duration into the insert-latency histogram under the query's name (the
  * per-*table* write latencies are observed separately inside
  * `foreachBatch`, where the table is known).
  *
  * The listener is scoped to one query via [[bindTo]]: only the bound
  * query's events are recorded, and termination of that query removes the
  * listener from the session — repeated pipeline starts on one session
  * would otherwise accumulate listeners, each cross-feeding every query's
  * progress into its (stale) metrics instance. */
final class MetricsListener(metrics: IngestMetrics) extends StreamingQueryListener {
  import StreamingQueryListener._
  import org.apache.spark.sql.SparkSession

  @volatile private var boundId: Option[java.util.UUID] = None
  @volatile private var session: Option[SparkSession] = None

  def bindTo(spark: SparkSession, queryId: java.util.UUID): Unit = {
    boundId = Some(queryId)
    session = Some(spark)
  }

  private def accepts(id: java.util.UUID): Boolean =
    boundId.forall(_ == id) // unbound (startup race window) = accept

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (accepts(p.id)) {
      val name = Option(p.name).getOrElse(p.id.toString)
      metrics.recordMessages(name, p.numInputRows)
      Option(p.durationMs.get("triggerExecution")).foreach { ms =>
        metrics.recordInsertSeconds(s"query:$name", ms.toDouble / 1000.0)
      }
      metrics.setLastProgress(p.json)
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    if (boundId.contains(event.id))
      session.foreach(_.streams.removeListener(this))
}
