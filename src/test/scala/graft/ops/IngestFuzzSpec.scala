package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

/** Hostile-input contract for every ingest parser: on ARBITRARY bytes
  * each must either return or throw an Exception — never hang (the
  * free-format MP3 loop the round-14 review caught is exactly this
  * class), never throw a JVM Error, and never succeed on a truncated
  * stream that the audit contract says must land exactly on EOF.
  *
  * Three generators per parser: (i) seeded random bytes, (ii) every
  * prefix truncation of a valid stream (the loop-bug sweep), (iii)
  * seeded single-byte mutations of a valid stream. Deterministic seeds
  * keep failures reproducible. */
class IngestFuzzSpec extends graft.SparkSpec {

  private def hostile(name: String, parse: Array[Byte] => Any,
      valid: Array[Byte], randomCases: Int = 150): Unit = {
    val rnd = new scala.util.Random(42)
    def run(bytes: Array[Byte], label: String): Unit =
      try { parse(bytes); () }
      catch {
        case _: Exception => () // throwing is the contract for bad input
        case e: Throwable => fail(s"$name on $label threw ${e.getClass}: $e")
      }
    // (i) pure random bytes at several lengths
    (0 until randomCases).foreach { k =>
      val len = 1 + rnd.nextInt(400)
      val b = new Array[Byte](len); rnd.nextBytes(b)
      run(b, s"random#$k")
    }
    run(Array.emptyByteArray, "empty")
    // (ii) every truncation of the valid stream
    (0 until valid.length).foreach(k => run(valid.take(k), s"truncation@$k"))
    // (iii) single-byte mutations of the valid stream
    (0 until 300).foreach { k =>
      val at = rnd.nextInt(valid.length)
      val m = valid.clone()
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      run(m, s"mutation#$k@$at")
    }
    // the pristine stream must still parse (guards generator drift)
    parse(valid)
  }

  test("MP3 demux and trim survive hostile bytes") {
    hostile("Mp3Ops.demux", Mp3Ops.demux, Mp3Ops.mp3Bytes(7L))
    hostile("Mp3Ops.trimFrames", b => Mp3Ops.trimFrames(b, _ % 2 == 0),
      Mp3Ops.mp3Bytes(8L))
  }

  test("H.264 demux and gopCut survive hostile bytes") {
    hostile("H264Ops.demux", H264Ops.demux, H264Ops.h264Bytes(7L))
    hostile("H264Ops.gopCut", H264Ops.gopCut, H264Ops.h264Bytes(8L))
  }

  test("WARC walk survives hostile bytes, plain and gzipped") {
    hostile("WarcOps.parse(plain)", WarcOps.parse, WarcOps.warcBytes(2L))
    hostile("WarcOps.parse(gz)", WarcOps.parse, WarcOps.warcBytes(3L))
  }

  test("HTML extract survives hostile markup") {
    val rnd = new scala.util.Random(43)
    val alphabet = "<>&;/!-= \"'pPaAmMsScCtTxy0打—é"
    (0 until 400).foreach { k =>
      val s = Seq.fill(1 + rnd.nextInt(120))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      try { HtmlOps.extract(s); () }
      catch {
        case _: Exception => ()
        case e: Throwable => fail(s"extract on case#$k threw ${e.getClass}")
      }
    }
    // structured-ish fragments that nearly match the special forms
    Seq("<!-", "<!--", "<script", "<script>", "</", "<", "&#x;", "&#;", "&;",
      "<p", "<a href='", "<style>x", "<!-->", "<p>&#xZZ;</p>").foreach { s =>
      try { HtmlOps.extract(s); () }
      catch { case _: Exception => () }
    }
  }

  test("PDF parse survives hostile bytes") {
    hostile("PdfOps.parse", PdfOps.parse, PdfOps.pdfBytes(7L, "some text"))
  }

  test("charset sniff and mojibake repair survive hostile input") {
    hostile("EncodingOps.sniffDecode", EncodingOps.sniffDecode,
      EncodingOps.encodedBytes(7L, "body"))
    val rnd = new scala.util.Random(44)
    (0 until 200).foreach { k =>
      val s = Seq.fill(1 + rnd.nextInt(80))((rnd.nextInt(0x250)).toChar).mkString
      try { EncodingOps.repair(s); () }
      catch {
        case _: Exception => ()
        case e: Throwable => fail(s"repair on case#$k threw ${e.getClass}")
      }
    }
  }

  test("URL canonicalize and robots parse survive hostile strings") {
    val rnd = new scala.util.Random(45)
    val urlChars = ":/%?#&=.~$*aA1-_"
    (0 until 400).foreach { k =>
      val s = "http://" + Seq.fill(rnd.nextInt(60))(
        urlChars(rnd.nextInt(urlChars.length))).mkString
      try { UrlOps.canonicalize(s); () }
      catch {
        case _: Exception => ()
        case e: Throwable => fail(s"canonicalize case#$k threw ${e.getClass}")
      }
    }
    val robotsChars = ":#*$/aAuUdDlLwW \n-"
    (0 until 300).foreach { k =>
      val s = Seq.fill(rnd.nextInt(200))(
        robotsChars(rnd.nextInt(robotsChars.length))).mkString
      try {
        val gs = RobotsOps.parseRobots(s)
        RobotsOps.selectGroup(gs, "graftbot")
          .foreach(g => RobotsOps.allowed(g, "/a/*b$"))
        ()
      } catch {
        case _: Exception => ()
        case e: Throwable => fail(s"robots case#$k threw ${e.getClass}")
      }
    }
  }
}
