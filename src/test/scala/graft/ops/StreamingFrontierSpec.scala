package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

// top-level so Catalyst can build a codegen'd Encoder
case class FetchedPage(doc_id: Long, text: String)

/** The crawl LOOP composed across the streaming store: fetched pages
  * land per micro-batch, q333's extractor discovers their canonical
  * out-links, the batch_id-keyed store accumulates them, and each
  * refresh re-schedules the not-yet-scheduled urls with q331's
  * politeness interleave. Pinned: a url discovered by TWO pages is
  * scheduled once, refreshes never re-issue a url (the seen-store
  * contract), every refresh's schedule keeps same-host gaps = |hosts|,
  * and a replayed batch changes nothing. */
class StreamingFrontierSpec extends SparkSpec {

  test("discover -> dedup -> schedule across batches; politeness per refresh; replay no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-frontier").toString
    val raw = s"$root/links"
    val issued = scala.collection.mutable.LinkedHashSet.empty[String]

    // q333's per-batch discovery: page -> canonical out-links
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      batch.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          val page = new String(HtmlOps.htmlBytes(id, text), UTF_8)
          HtmlOps.extract(page).anchors.map { case (href, _) =>
            UrlOps.canonicalize(s"http://example-${id % 3}.test$href")
          } // id%3 folds pages onto 3 hosts so urls COLLIDE across pages
        })
        .toDF("url")
        .write.mode("overwrite").parquet(s"$raw/batch_id=$batchId")

    val mem = MemoryStream[FetchedPage](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    /** One frontier refresh: all discovered urls minus already-issued,
      * scheduled with the q331 interleave; returns (url, slot) rows. */
    def refresh(): Seq[(String, Long)] = {
      val pending = s.read.option("basePath", raw).parquet(raw)
        .select(col("url")).distinct()
        .filter(!col("url").isin(issued.toSeq: _*))
        .withColumn("host", regexp_extract(col("url"), "http://([^/]+)/", 1))
      val hosts = pending.select(col("host")).distinct()
        .withColumn("h", row_number().over(Window.orderBy(col("host"))) - 1)
      val nh = hosts.count()
      val out = pending
        .withColumn("r", row_number().over(
          Window.partitionBy(col("host")).orderBy(col("url"))))
        .join(hosts, Seq("host"))
        .select(col("url"), ((col("r") - 1) * nh + col("h")).as("slot"))
        .as[(String, Long)].collect().toSeq.sortBy(_._2)
      // politeness: within each refresh, same-host slots are nh apart
      out.groupBy(t => t._1.split('/')(2)).foreach { case (host, ss) =>
        val slots = ss.map(_._2).sorted
        slots.sliding(2).foreach {
          case Seq(a, b) => assert(b - a == nh, s"$host gap")
          case _ => ()
        }
      }
      out.foreach { case (u, _) => issued += u }
      out
    }

    try {
      mem.addData(FetchedPage(0L, "page zero"), FetchedPage(3L, "page three"))
      q.processAllAvailable()
      // pages 0 and 3 share host example-0.test -> /home and /about COLLIDE
      val r1 = refresh()
      assert(r1.map(_._1).distinct.size === r1.size, "refresh 1 duplicate urls")
      assert(r1.map(_._1).toSet ===
        Set("http://example-0.test/home", "http://example-0.test/about?q=1&r=2"))

      mem.addData(FetchedPage(1L, "page one"), FetchedPage(2L, "page two"))
      q.processAllAvailable()
      val r2 = refresh()
      // nothing from refresh 1 re-issued; hosts 1 and 2 now appear
      assert(r2.map(_._1).toSet.intersect(r1.map(_._1).toSet).isEmpty,
        s"re-issued a seen url: $r2")
      assert(r2.size === 7) // 3 links on host 1, 4 on host 2

      // replay of batch 1: idempotent overwrite, a further refresh is empty
      sinkBody(Seq(FetchedPage(1L, "page one"), FetchedPage(2L, "page two"))
        .toDF("doc_id", "text"), 1L)
      assert(refresh().isEmpty, "replayed batch must not re-feed the frontier")
    } finally q.stop()
  }

  test("composed crawl round (q337 form): accumulated store re-scheduled == batch over the union") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-crawlround").toString
    val store = s"$root/frontier"

    // per-batch: the q337 discover+admit seam lands the narrow frontier
    // into the batch_id-keyed idempotent store — pages never accumulate
    def sinkBody(batch: DataFrame, batchId: Long): Unit =
      FrontierOps.discoverFrontier(batch)
        .write.mode("overwrite").parquet(s"$store/batch_id=$batchId")

    val mem = MemoryStream[FetchedPage](s)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch(sinkBody _)
      .start()

    val docs = graft.schema.Tables.t(s, sf001, "documents")
      .select(col("doc_id"), col("text"))
    def feed(from: Long, until: Long): Unit = {
      mem.addData(docs.filter(col("doc_id") >= from && col("doc_id") < until)
        .as[(Long, String)].collect().map { case (id, t) => FetchedPage(id, t) }
        .toIndexedSeq: _*)
      q.processAllAvailable()
    }
    /** one schedule refresh off the ACCUMULATED store, through the
      * identical q337 tail (nd = fetched-corpus size so far) */
    def schedule(): Seq[org.apache.spark.sql.Row] = {
      val fr = s.read.option("basePath", store).parquet(store)
        .select(col("doc_id"), col("host"), col("url"), col("robots_ok"))
      FrontierOps.crawlRound(fr,
        fr.agg(countDistinct(col("doc_id")).as("n"))).collect().toSeq
    }
    def batchTwin(until: Long): Seq[org.apache.spark.sql.Row] = {
      val slice = docs.filter(col("doc_id") < until)
      FrontierOps.crawlRound(FrontierOps.discoverFrontier(slice),
        slice.agg(count(lit(1)).as("n"))).collect().toSeq
    }

    try {
      feed(0L, 40L)
      assert(schedule() === batchTwin(40L), "stream != batch after batch 0")
      feed(40L, 80L)
      val after2 = schedule()
      assert(after2 === batchTwin(80L), "stream != batch after batch 1")
      // replayed batch: idempotent overwrite, schedule unchanged
      sinkBody(docs.filter(col("doc_id") >= 40L && col("doc_id") < 80L), 1L)
      assert(schedule() === after2, "replayed batch moved the schedule")
    } finally q.stop()
  }
}
