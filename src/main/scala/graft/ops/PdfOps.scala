package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** PDF text extraction — the document half of the crawl-ingest layer
  * ([[WarcOps]] records → [[HtmlOps]] pages → PDFs): at corpus scale a
  * large share of high-quality training text arrives as PDF, and the
  * extraction stage must walk the REAL container, not shell out. The
  * reference treats payloads as opaque (`/root/reference/pkg/converter/
  * converter.go:52-57`); this extends the curation surface per the north
  * star.
  *
  * What is REAL here, layer by layer (ISO 32000 / PDF 1.4):
  *   - `startxref` discovery from the file tail and the xref TABLE walk
  *     (20-byte entries, 10-digit offsets) — every object offset is
  *     validated against the actual `N 0 obj` position, so a single
  *     miscounted byte anywhere in the writer or reader fails loudly;
  *   - the object graph walk trailer `/Root` → catalog `/Pages` →
  *     `/Kids` → page `/Contents` (indirect references resolved through
  *     the xref, never by scanning);
  *   - a real `/Filter /FlateDecode` content stream inflated with the
  *     JDK's zlib (`/Length` exact — stream bytes are length-delimited,
  *     not scanned);
  *   - content-stream tokenization: `BT/ET` text objects, `Tj` shows and
  *     `TJ` arrays (strings collected in order, kerning numbers
  *     skipped), PDF string syntax with BALANCED parentheses, the
  *     `\( \) \\ \n \r \t \b \f` escapes, octal `\ddd`, and the
  *     ignored-backslash rule.
  *
  * Correctness is strict end-to-end against the REAL text column: the
  * page shows a parenthesis-and-backslash-laden header line plus the
  * document text in 60-char chunks (escape applied chunk-wise; odd docs
  * use one TJ array, even docs sequential Tj shows), and Spark must
  * recover `header + text` byte-exactly through deflate→xref→graph→
  * tokenize→unescape for the md5 to match the oracle's concat of the
  * raw columns.
  */
object PdfOps {

  private[ops] val ChunkLen = 60

  /** The shown header line: parens and backslashes FORCE the string
    * escapes through the strict path on every document. */
  private[ops] def headerLine(id: Long): String = s"Doc ($id) \\graft\\\n"

  // ----------------------------------------------------- string escape

  /** PDF string escape — inverse of [[unescapeString]] for any input. */
  private[ops] def escapeString(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.toString
  }

  // ------------------------------------------------------------- synth

  /** Deflate with the JDK's real zlib — the stream the parser must
    * inflate back. */
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** A real one-page PDF for the document: catalog/pages/page/content/
    * font objects, Flate-compressed content stream, exact xref table and
    * trailer. Offsets are tracked as the file is written, so the xref is
    * correct by construction — and the parser re-validates every entry. */
  private[ops] def pdfBytes(id: Long, text: String): Array[Byte] = {
    val t = Option(text).getOrElse("")
    val chunks = t.grouped(ChunkLen).toVector
    val content = {
      val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      sb.append('(').append(escapeString(headerLine(id))).append(") Tj\n")
      if (id % 2 == 1) { // TJ array form with kerning numbers to skip
        if (chunks.nonEmpty) {
          sb.append("0 -14 Td [ ")
          chunks.zipWithIndex.foreach { case (c, k) =>
            if (k > 0) sb.append(" -120 ")
            sb.append('(').append(escapeString(c)).append(')')
          }
          sb.append(" ] TJ\n")
        }
      } else chunks.foreach { c => // sequential Tj shows
        sb.append("0 -14 Td (").append(escapeString(c)).append(") Tj\n")
      }
      sb.append("ET\n").toString.getBytes(UTF_8)
    }
    val flate = deflate(content)

    val out = new java.io.ByteArrayOutputStream(flate.length + 1024)
    val offsets = new Array[Int](6)
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    w("%PDF-1.4\n")
    offsets(1) = out.size()
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = out.size()
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets(3) = out.size()
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    offsets(4) = out.size()
    w(s"4 0 obj << /Length ${flate.length} /Filter /FlateDecode >> stream\n")
    out.write(flate)
    w("\nendstream endobj\n")
    offsets(5) = out.size()
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val xrefAt = out.size()
    w("xref\n0 6\n")
    w("0000000000 65535 f \n")
    (1 to 5).foreach(k => w(f"${offsets(k)}%010d 00000 n \n"))
    w(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------- parse

  /** Extracted document facts — every field read back from the bytes. */
  private[ops] final case class PdfDoc(
      text: String, nObjects: Long, nShows: Long)

  /** PDF string reader at `(`: balanced parens, the standard escapes,
    * octal, ignored backslash. Returns (decoded, indexAfterClosing). */
  private[ops] def readString(s: String, open: Int): (String, Int) = {
    require(s.charAt(open) == '(', "not at a string")
    val sb = new StringBuilder
    var depth = 1
    var i = open + 1
    while (depth > 0) {
      require(i < s.length, "unterminated PDF string")
      val c = s.charAt(i)
      if (c == '\\') {
        require(i + 1 < s.length, "dangling escape")
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' | ')' | '\\' => sb.append(e); i += 2
          case d if d >= '0' && d <= '7' => // up to 3 octal digits
            var v = 0; var n = 0; var j = i + 1
            while (n < 3 && j < s.length && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); n += 1; j += 1
            }
            sb.append((v & 0xff).toChar); i = j
          case '\n' => i += 2 // line continuation: both chars dropped
          case other => sb.append(other); i += 2 // backslash ignored
        }
      } else {
        if (c == '(') { depth += 1; sb.append(c) }
        else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c) }
        else sb.append(c)
        i += 1
      }
    }
    (sb.toString, i)
  }

  /** Full structural parse: tail startxref → xref table (offsets
    * VALIDATED against the real object positions) → trailer /Root →
    * catalog → pages → page → /Contents stream → inflate → tokenize.
    * Throws on any structural inconsistency — an audit, not a salvage. */
  private[ops] def parse(bytes: Array[Byte]): PdfDoc = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    require(s.startsWith("%PDF-"), "missing PDF header")

    val sxAt = s.lastIndexOf("startxref")
    require(sxAt >= 0, "missing startxref")
    val xrefAt = s.substring(sxAt + 9, s.indexOf("%%EOF", sxAt)).trim.toInt
    require(s.startsWith("xref", xrefAt), "startxref does not point at xref")

    // xref table: "0 N" then N 20-byte entries
    val hdrEnd = s.indexOf('\n', xrefAt + 5)
    val Array(first, count) = s.substring(xrefAt + 5, hdrEnd).trim.split(" ").map(_.toInt)
    require(first == 0, "xref subsection must start at object 0")
    val entries = (0 until count).map { k =>
      val at = hdrEnd + 1 + 20 * k
      (s.substring(at, at + 10).toInt, s.charAt(at + 17))
    }
    val offsets = entries.map(_._1)
    (1 until count).foreach { k =>
      require(entries(k)._2 == 'n', s"object $k not in use")
      require(s.startsWith(s"$k 0 obj", offsets(k)),
        s"xref offset for object $k does not point at it")
    }

    def objBody(k: Int): String = {
      val from = offsets(k)
      val end = s.indexOf("endobj", from)
      require(end >= 0, s"object $k missing endobj")
      s.substring(from, end)
    }
    def ref(body: String, key: String): Int = {
      val at = body.indexOf(key)
      require(at >= 0, s"missing $key")
      val m = body.substring(at + key.length).trim
      val sp = m.indexOf(' ')
      val n = m.substring(0, sp).toInt
      require(m.substring(sp).trim.startsWith("0 R"), s"$key is not an indirect ref")
      n
    }

    // trailer /Root → catalog /Pages → first kid → /Contents
    val trailerAt = s.lastIndexOf("trailer")
    val root = ref(s.substring(trailerAt, sxAt), "/Root")
    val pages = ref(objBody(root), "/Pages")
    val kidsBody = objBody(pages)
    val kidsAt = kidsBody.indexOf("/Kids")
    require(kidsAt >= 0, "missing /Kids")
    val kid = kidsBody.substring(kidsBody.indexOf('[', kidsAt) + 1).trim
      .split(" ")(0).toInt
    val contents = ref(objBody(kid), "/Contents")

    // the content stream: /Length-delimited, optionally FlateDecode
    val cBody = objBody(contents)
    val lenAt = cBody.indexOf("/Length")
    require(lenAt >= 0, "stream missing /Length")
    val length = cBody.substring(lenAt + 7).trim.split("[ />]")(0).toInt
    val streamTag = s.indexOf("stream", offsets(contents))
    require(streamTag >= 0 && s.charAt(streamTag + 6) == '\n', "malformed stream keyword")
    val dataAt = streamTag + 7
    val raw = bytes.slice(dataAt, dataAt + length)
    require(s.startsWith("\nendstream", dataAt + length), "stream length mismatch")
    val content = if (cBody.contains("/FlateDecode")) {
      val inf = new java.util.zip.Inflater()
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 3 + 64)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || inf.finished(), "truncated Flate stream")
        out.write(buf, 0, n)
      }
      inf.end()
      new String(out.toByteArray, UTF_8)
    } else new String(raw, UTF_8)

    // tokenize: collect every shown string in order (Tj and TJ alike)
    val sb = new StringBuilder
    var shows = 0L
    var inText = false
    var i = 0
    while (i < content.length) {
      val c = content.charAt(i)
      if (content.startsWith("BT", i) && (i == 0 || content.charAt(i - 1).isWhitespace)) {
        inText = true; i += 2
      } else if (content.startsWith("ET", i) && inText) {
        inText = false; i += 2
      } else if (c == '(' && inText) {
        val (str, next) = readString(content, i)
        sb.append(str); shows += 1; i = next
      } else i += 1
    }
    require(!inText, "unterminated BT text object")
    PdfDoc(sb.toString, count.toLong, shows)
  }

  // ------------------------------------------------------------ queries

  val qs: Seq[Q] = Seq(

    // ---- PDF text extraction audit ----
    // Spark writes each document as a real one-page Flate-compressed PDF
    // and extracts the text back through xref → object graph → inflate →
    // content tokenizer → string unescape; the oracle concats the raw
    // columns. Any offset, length, zlib, tokenizer, or escape defect
    // breaks the hashes.
    Q("q305_pdf_extract",
      """SELECT doc_id,
        |  md5('Doc (' || CAST(doc_id AS VARCHAR) || ') \graft\' || chr(10)
        |      || coalesce(text, '')) AS text_md5,
        |  CAST(15 + len(CAST(doc_id AS VARCHAR)) + len(coalesce(text, ''))
        |      AS BIGINT) AS text_len,
        |  CAST(6 AS BIGINT) AS n_objects,
        |  CAST(1 + (len(coalesce(text, '')) + 59) // 60 AS BIGINT) AS n_shows
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val doc = parse(pdfBytes(id, text))
          (id, Md5Hex.of(doc.text), Md5Hex.codePoints(doc.text),
            doc.nObjects, doc.nShows)
        })
        .toDF("doc_id", "text_md5", "text_len", "n_objects", "n_shows")
        .orderBy(col("doc_id"))
    }
  )
}
