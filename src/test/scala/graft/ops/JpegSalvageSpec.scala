package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{ImageIO, ImageWriteParam}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The conf-gated progressive-JPEG salvage mode (VERDICT r12 item 3):
  * a corrupted/truncated mid-stream scan decodes to the raster the
  * accumulated scans produce — libjpeg's tolerance posture for crawl
  * data — while the DEFAULT strict posture still throws, and a stream
  * with no complete scan throws even with salvage on.
  *
  * The load-bearing equality: truncating EXACTLY at a scan boundary and
  * salvaging must render the SAME raster as strictly decoding the same
  * prefix with a proper EOI appended — i.e. salvage renders the
  * accumulated state, it does not invent pixels.
  */
class JpegSalvageSpec extends SparkSpec {

  System.setProperty("java.awt.headless", "true")

  private def encodeProg(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
    img
  }

  /** offsets of every SOS (0xFFDA) marker in the stream. */
  private def sosOffsets(bytes: Array[Byte]): Seq[Int] =
    (2 until bytes.length - 1).filter(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xda)

  private val fixture: Array[Byte] = encodeProg(
    grayImage(48, 32)((x, y) => (x * 7 + y * 11 + (x * y) % 31) % 256), 0.9f)

  test("scan-boundary truncation: salvage == strict decode of prefix+EOI") {
    val sos = sosOffsets(fixture)
    assert(sos.length >= 3, s"fixture has ${sos.length} scans — need a multi-scan script")
    // cut right where scan k+1's SOS would start: scans 1..k are complete
    for (cut <- Seq(sos(2), sos.last)) {
      val truncated = fixture.take(cut)
      intercept[Exception](JpegCodec.decode(truncated)) // strict: throws
      val salvaged = JpegCodec.decode(truncated, salvageProgressive = true)
      val prefix = truncated ++ Array[Byte](0xff.toByte, 0xd9.toByte)
      val strict = JpegCodec.decode(prefix) // a VALID progressive prefix
      assert(salvaged.width == 48 && salvaged.height == 32 && salvaged.ncomp == 1)
      assert(salvaged.pixels.toSeq == strict.pixels.toSeq,
        "salvage must render exactly the accumulated scans")
    }
  }

  test("mid-scan truncation: strict throws, salvage renders deterministically") {
    val sos = sosOffsets(fixture)
    // cut INSIDE the final scan's entropy data
    val cut = sos.last + (fixture.length - sos.last) / 2
    val truncated = fixture.take(cut)
    intercept[Exception](JpegCodec.decode(truncated))
    val a = JpegCodec.decode(truncated, salvageProgressive = true)
    val b = JpegCodec.decode(truncated, salvageProgressive = true)
    assert(a.width == 48 && a.height == 32 && a.ncomp == 1)
    assert(a.pixels.toSeq == b.pixels.toSeq, "salvage must be deterministic")
    // degraded, not destroyed: the full decode's image is still recognizable
    val full = JpegCodec.decode(fixture)
    val meanDiff = a.pixels.zip(full.pixels).iterator
      .map { case (x, y) => math.abs(x - y) }.sum.toDouble / a.pixels.length
    assert(meanDiff <= 32.0, f"salvaged raster drifted $meanDiff%.1f/pixel from the full decode")
  }

  test("no complete scan: salvage still throws (nothing to salvage)") {
    val sos = sosOffsets(fixture)
    // cut inside the FIRST scan's entropy data — zero scans accumulated
    val cut = sos.head + 8
    val truncated = fixture.take(cut)
    intercept[Exception](JpegCodec.decode(truncated, salvageProgressive = true))
    // and a bad scan header stays loud regardless of salvage: Ss=0 with
    // Se>0 (T.81 G.1 violation, ADVICE r12) planted into the first scan
    val bad = fixture.clone()
    val hdr = sos.head + 4 // len(2) + ns(1) at sos+2..4; ns=1 → Ss at sos+7
    val ns = bad(hdr) & 0xff
    val ssAt = hdr + 1 + 2 * ns
    bad(ssAt) = 0; bad(ssAt + 1) = 5 // Ss=0, Se=5
    val e = intercept[IllegalArgumentException](
      JpegCodec.decode(bad, salvageProgressive = true))
    assert(e.getMessage.contains("spectral band"))
  }

  test("planted corrupt doc: pipeline drops nothing with salvage on") {
    val s = spark
    import s.implicits._
    val sos = sosOffsets(fixture)
    val corrupt = fixture.take(sos.last + (fixture.length - sos.last) / 2)
    val docs = Seq((1L, fixture), (2L, corrupt), (3L, fixture))
    val out = docs.toDF("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val d = JpegCodec.decode(bytes, salvageProgressive = true)
          (id, d.width, d.height)
        }
      }
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 48, 32), (2L, 48, 32), (3L, 48, 32)))
    // strict posture (the default) fails the task on the planted doc
    intercept[org.apache.spark.SparkException] {
      docs.toDF("doc_id", "payload").as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (_, b) => JpegCodec.decode(b).width })
        .collect()
    }
  }
}
