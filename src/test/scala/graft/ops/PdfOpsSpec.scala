package graft.ops

/** PDF extraction: string escape/unescape on every form (incl. octal,
  * ignored backslash, balanced parens), full container round trips
  * through both Tj and TJ shows, and structural corruption (bad xref
  * offsets, stream length lies) must throw. */
class PdfOpsSpec extends graft.SparkSpec {

  test("PDF string reader handles every escape form") {
    def rt(s: String): String = {
      val (out, next) = PdfOps.readString(s, 0)
      assert(next === s.length, s"must consume all of '$s'")
      out
    }
    assert(rt("(plain)") === "plain")
    assert(rt("(a\\(b\\)c \\\\ d)") === "a(b)c \\ d")
    assert(rt("(nl\\nrt\\r\\t)") === "nl\nrt\r\t")
    assert(rt("(oct \\101\\102 \\7end)") === "oct AB end")
    assert(rt("(ignored \\g backslash)") === "ignored g backslash")
    // balanced parens need no escape per the spec
    assert(rt("(bal (anced (deep)) ok)") === "bal (anced (deep)) ok")
    intercept[IllegalArgumentException](PdfOps.readString("(never closed", 0))
  }

  test("escape → readString is the identity on adversarial text") {
    Seq("", "parens (every) (where)", "back\\slash \\\\ two", "line\nbreak\ttab",
      "mix (\\) \n close").foreach { s =>
      val enc = "(" + PdfOps.escapeString(s) + ")"
      assert(PdfOps.readString(enc, 0)._1 === s, s"round trip of '$s'")
    }
  }

  test("container round-trips header+text through both Tj and TJ forms") {
    val texts = Seq("", "short", "x" * 200, "with (parens) and \\slashes\\ inside")
    texts.foreach { text =>
      Seq(2L, 3L).foreach { id => // even = Tj shows, odd = TJ array
        val doc = PdfOps.parse(PdfOps.pdfBytes(id, text))
        assert(doc.text === PdfOps.headerLine(id) + text, s"id $id text '$text'")
        assert(doc.nObjects === 6L)
        assert(doc.nShows === 1L + (text.length + 59) / 60, s"id $id shows")
      }
    }
  }

  test("xref offset and stream length corruption throw") {
    val bytes = PdfOps.pdfBytes(4L, "some document text")
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    // corrupt object 3's xref offset (third 20-byte entry after the header)
    val xrefAt = s.lastIndexOf("xref\n0 6\n")
    val entryAt = xrefAt + 9 + 20 * 3
    val bad = bytes.clone()
    bad(entryAt + 3) = '9' // 0009xxxxxx: a wrong (but parseable) offset
    assert(intercept[IllegalArgumentException](PdfOps.parse(bad))
      .getMessage.contains("object 3"))
    // lie about /Length: the endstream anchor check must fire
    val lenAt = s.indexOf("/Length ") + 8
    val short = bytes.clone()
    short(lenAt) = '1'; short(lenAt + 1) = ' ' // tiny length
    intercept[Exception](PdfOps.parse(short))
  }

  test("q305 recovers header+text for every document at sf0.001") {
    val rows = graft.SparkEntry.queries("q305_pdf_extract")(spark, sf001).collect()
    assert(rows.length === 500)
    val texts = graft.schema.Tables.t(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(30).foreach { r =>
      val id = r.getLong(0)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((PdfOps.headerLine(id) + texts(id))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(r.getString(1) === hex, s"doc $id")
    }
  }
}
