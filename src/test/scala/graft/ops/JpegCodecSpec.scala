package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO
import javax.imageio.ImageWriteParam
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Cross-decoder validation of [[JpegCodec]] against the JDK's
  * libjpeg-backed ImageIO reader — a genuinely independent implementation
  * of the same T.81 standard. The spec encodes with ImageIO (so the
  * fixture bytes come from a REAL third-party encoder, not our own code),
  * then decodes the same bytes twice. T.81 licenses conforming decoders
  * to differ by ±1/pixel on the IDCT, and chroma upsampling is
  * implementation-defined (libjpeg's fancy upsampling vs our
  * replication), so gray asserts a ±1 bound and color a small one away
  * from chroma edges — bounds MEASURED first, then pinned.
  */
class JpegCodecSpec extends AnyFunSuite {

  System.setProperty("java.awt.headless", "true")

  private def encodeJdk(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
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

  private def rgbImage(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
    }
    img
  }

  test("gray: ours vs the JDK decoder agree within the T.81 IDCT latitude (±1)") {
    // several shapes: single MCU, multi-MCU, non-multiple-of-8 edges
    for ((w, h) <- Seq((8, 8), (24, 16), (29, 13), (64, 48))) {
      val img = grayImage(w, h)((x, y) => (x * 7 + y * 11 + (x * y) % 31) % 256)
      val bytes = encodeJdk(img, 0.9f)
      val ours = JpegCodec.decode(bytes)
      assert(ours.width == w && ours.height == h && ours.ncomp == 1)
      val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxd = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(ours.pixels(y * w + x) - jdk.getRaster.getSample(x, y, 0))
        maxd = math.max(maxd, d)
      }
      assert(maxd <= 1, s"${w}x$h gray: max |ours - jdk| = $maxd")
    }
  }

  test("gray: quality sweep stays within the same bound") {
    for (q <- Seq(0.5f, 0.75f, 0.95f)) {
      val (w, h) = (40, 24)
      val img = grayImage(w, h)((x, y) => 128 + (100 * math.sin(x / 3.0) * math.cos(y / 2.0)).toInt)
      val bytes = encodeJdk(img, q)
      val ours = JpegCodec.decode(bytes)
      val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxd = 0
      for (y <- 0 until h; x <- 0 until w)
        maxd = math.max(maxd,
          math.abs(ours.pixels(y * w + x) - jdk.getRaster.getSample(x, y, 0)))
      assert(maxd <= 1, s"q=$q: max |ours - jdk| = $maxd")
    }
  }

  test("color: smooth gradient agrees channel-wise within the chroma-upsampling bound") {
    // smooth image so libjpeg's fancy chroma upsampling and our
    // replication see near-constant chroma; the JDK encodes RGB as
    // 4:2:0 YCbCr, so this exercises subsampled multi-component MCUs
    val (w, h) = (32, 32)
    val img = rgbImage(w, h)((x, y) => (4 * x + 60, 3 * y + 40, 2 * (x + y) + 30))
    val bytes = encodeJdk(img, 0.9f)
    val ours = JpegCodec.decode(bytes)
    assert(ours.ncomp == 3 && ours.width == w && ours.height == h)
    val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
    var maxd = 0
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val j = (jdk.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs(ours.pixels(3 * (y * w + x) + c) - j)
      maxd = math.max(maxd, d)
      sum += d
    }
    val mean = sum.toDouble / (3 * w * h)
    info(f"color: maxd=$maxd mean=$mean%.3f")
    // replication vs fancy upsampling differ most at chroma gradients;
    // measured maxd = 4, mean 0.59 on this image — pinned with headroom
    assert(maxd <= 8, s"color: max channel diff = $maxd")
    assert(mean <= 2.0, s"color: mean channel diff = $mean")
  }

  test("our decode of an ImageIO re-encode of our decode is stable (idempotent pipeline)") {
    val (w, h) = (24, 16)
    val img = grayImage(w, h)((x, y) => (x * 13 + y * 5) % 256)
    val once = JpegCodec.decode(encodeJdk(img, 0.9f))
    val back = grayImage(w, h)((x, y) => once.pixels(y * w + x))
    val twice = JpegCodec.decode(encodeJdk(back, 0.9f))
    var maxd = 0
    for (i <- 0 until w * h)
      maxd = math.max(maxd, math.abs(once.pixels(i) - twice.pixels(i)))
    info(s"reencode drift maxd=$maxd")
    // re-encoding an already-quantized image moves pixels very little
    assert(maxd <= 6, s"roundtrip drift $maxd")
  }

  private def encodeJdkProg(img: BufferedImage, quality: Float): Array[Byte] = {
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

  test("progressive gray: ours vs the JDK decoder within the IDCT latitude (±1)") {
    for ((w, h) <- Seq((8, 8), (24, 16), (29, 13), (64, 48))) {
      val img = grayImage(w, h)((x, y) => (x * 7 + y * 11 + (x * y) % 31) % 256)
      val bytes = encodeJdkProg(img, 0.9f)
      // the fixture must actually BE progressive or this test proves nothing
      val sof = (2 until bytes.length - 1).collectFirst {
        case i if (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) >= 0xc0 &&
          (bytes(i + 1) & 0xff) <= 0xcf && (bytes(i + 1) & 0xff) != 0xc4 =>
          bytes(i + 1) & 0xff
      }
      assert(sof.contains(0xc2), s"JDK writer emitted SOF ${sof.map(_.toHexString)}")
      val ours = JpegCodec.decode(bytes)
      assert(ours.width == w && ours.height == h && ours.ncomp == 1)
      val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxd = 0
      for (y <- 0 until h; x <- 0 until w)
        maxd = math.max(maxd,
          math.abs(ours.pixels(y * w + x) - jdk.getRaster.getSample(x, y, 0)))
      assert(maxd <= 1, s"${w}x$h progressive gray: max |ours - jdk| = $maxd")
    }
  }

  test("progressive gray: quality sweep (different scan scripts) stays within ±1") {
    for (q <- Seq(0.5f, 0.75f, 0.95f)) {
      val (w, h) = (40, 24)
      val img = grayImage(w, h)((x, y) =>
        128 + (100 * math.sin(x / 3.0) * math.cos(y / 2.0)).toInt)
      val bytes = encodeJdkProg(img, q)
      val ours = JpegCodec.decode(bytes)
      val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxd = 0
      for (y <- 0 until h; x <- 0 until w)
        maxd = math.max(maxd,
          math.abs(ours.pixels(y * w + x) - jdk.getRaster.getSample(x, y, 0)))
      assert(maxd <= 1, s"progressive q=$q: max |ours - jdk| = $maxd")
    }
  }

  test("progressive color: 4:2:0 interleaved-DC + per-component AC scans agree") {
    val (w, h) = (32, 32)
    val img = rgbImage(w, h)((x, y) => (4 * x + 60, 3 * y + 40, 2 * (x + y) + 30))
    val bytes = encodeJdkProg(img, 0.9f)
    val ours = JpegCodec.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.ncomp == 3)
    val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
    var maxd = 0
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val j = (jdk.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs(ours.pixels(3 * (y * w + x) + c) - j)
      maxd = math.max(maxd, d)
      sum += d
    }
    val mean = sum.toDouble / (3 * w * h)
    info(f"progressive color: maxd=$maxd mean=$mean%.3f")
    assert(maxd <= 8, s"progressive color: max channel diff = $maxd")
    assert(mean <= 2.0, s"progressive color: mean channel diff = $mean")
  }

  test("progressive == sequential within the IDCT latitude on the same source") {
    // both scan machines decode re-encodings of the SAME raster; agreement
    // pins the progressive coefficient accumulation against the sequential
    // path that q284/q285 already audit per document
    val (w, h) = (24, 16)
    val img = grayImage(w, h)((x, y) => (x * 13 + y * 5) % 256)
    val seq = JpegCodec.decode(encodeJdk(img, 0.9f))
    val prog = JpegCodec.decode(encodeJdkProg(img, 0.9f))
    var maxd = 0
    for (i <- 0 until w * h)
      maxd = math.max(maxd, math.abs(seq.pixels(i) - prog.pixels(i)))
    info(s"seq-vs-prog maxd=$maxd")
    assert(maxd <= 2, s"scan machines disagree by $maxd")
  }

  test("arithmetic/lossless and non-JPEG inputs are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decode(Array[Byte](1, 2, 3, 4, 5))
    }
    assert(e.getMessage.contains("SOI"))
    // hand-build a minimal stream up to a lossless SOF3 marker
    val lossless = Array[Int](0xff, 0xd8, 0xff, 0xc3, 0x00, 0x0b,
      8, 0, 8, 0, 8, 1, 1, 0x11, 0).map(_.toByte)
    val e2 = intercept[UnsupportedOperationException](JpegCodec.decode(lossless))
    assert(e2.getMessage.contains("ffc3"))
  }
}
