package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The crawl family on Spark's REAL file-arrival source: `.warc.gz`
  * segment files landing in a directory, picked up by a `binaryFile`
  * readStream (the production shape for crawl drops — no Kafka broker
  * needed), each micro-batch walking its segments through the same
  * gzip→WARC→HTML seam as q306. Asserts the two-drop arrival produces
  * exactly the per-segment extractions and that the source does not
  * re-deliver already-processed files. */
class StreamingWarcFileSpec extends SparkSpec {

  private def writeSegment(dir: String, id: Long, text: String): Unit = {
    val f = java.nio.file.Paths.get(dir, f"segment-$id%05d.warc.gz")
    java.nio.file.Files.write(f, WarcOps.crawlBytes(id, text))
  }

  private def extractOf(batch: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    batch.select("content").as[Array[Byte]].mapPartitions(_.map { bytes =>
      val (info, responses) = WarcOps.walk(bytes)
      val pages = responses.filter(r =>
        r.statusCode == 200 && r.contentType.startsWith("text/html"))
      val content = pages.map(p => HtmlOps.extract(new String(p.body,
        java.nio.charset.StandardCharsets.UTF_8)).content).mkString
      (info.nRecords, Md5Hex.of(content))
    }).toDF("n_records", "text_md5")
  }

  test("binaryFile stream of .warc.gz drops feeds the extraction seam") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-warc-files").toString
    val in = s"$root/in"; val store = s"$root/out"
    new java.io.File(in).mkdirs()

    // ids 1 and 3: odd ⇒ the gzip member-per-record form (real .warc.gz)
    writeSegment(in, 1L, "body of the first dropped segment")
    val binarySchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
    val mem = s.readStream.format("binaryFile").schema(binarySchema).load(in)
    val q = mem.writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        extractOf(batch).write.mode("overwrite").parquet(s"$store/batch_id=$batchId")
      }
      .start()

    def md5s = s.read.parquet(store).select("text_md5")
      .collect().map(_.getString(0)).toSet

    try {
      q.processAllAvailable()
      val expect1 = Md5Hex.of("body of the first dropped segment")
      assert(md5s === Set(expect1), "first drop extracted")

      writeSegment(in, 3L, "body of the second dropped segment")
      q.processAllAvailable()
      val expect3 = Md5Hex.of("body of the second dropped segment")
      assert(md5s === Set(expect1, expect3), "second drop extracted, first not re-delivered")
      assert(s.read.parquet(store).count() === 2, "exactly one row per segment")
    } finally q.stop()
  }
}
