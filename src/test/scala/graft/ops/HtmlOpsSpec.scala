package graft.ops

/** HTML extraction: entity decode on every form, escape→extract identity
  * on adversarial text, elision of script/style/comment bodies full of
  * fake markup, and quote-aware tag scanning. */
class HtmlOpsSpec extends graft.SparkSpec {

  test("entity decode: named, decimal, hex, passthrough") {
    val d = HtmlOps.decodeEntities _
    assert(d("a &amp; b &lt;c&gt; &quot;q&quot; &apos;s&apos;") === "a & b <c> \"q\" 's'")
    assert(d("&#65;&#98;&#x43;&#x64;") === "AbCd")
    assert(d("&copy; &mdash; &nbsp;") === "© —  ")
    // unknown or unterminated entities pass through verbatim
    assert(d("&bogus; & bare &amp") === "&bogus; & bare &amp")
    assert(d("tail&") === "tail&")
  }

  test("escape → extract is the identity on adversarial text") {
    val nasty = Seq(
      "a < b && c > d", "already &amp; escaped", "<p>fake</p>",
      "", "plain words only", "x&#65;y (not an entity after escape)")
    nasty.foreach { text =>
      val page = new String(HtmlOps.htmlBytes(42L, text),
        java.nio.charset.StandardCharsets.UTF_8)
      val doc = HtmlOps.extract(page)
      assert(doc.content === text, s"round trip of '$text'")
    }
  }

  test("script/style/comment bodies and quoted '>' never leak") {
    (0L to 11L).foreach { id =>
      val page = new String(HtmlOps.htmlBytes(id, "the real content"),
        java.nio.charset.StandardCharsets.UTF_8)
      val doc = HtmlOps.extract(page)
      assert(doc.content === "the real content", s"doc $id content")
      assert(doc.title === s"Doc $id — graft", s"doc $id title")
      assert(doc.nLinks === HtmlOps.Schedule(id).nLinks.toLong, s"doc $id links")
      assert(doc.nParagraphs === HtmlOps.Schedule(id).nParagraphs.toLong,
        s"doc $id paragraphs")
    }
  }

  test("malformed markup throws instead of silently truncating") {
    intercept[IllegalArgumentException](HtmlOps.extract("<p unterminated"))
    intercept[IllegalArgumentException](HtmlOps.extract("a <!-- never closed"))
    intercept[IllegalArgumentException](HtmlOps.extract("<script>var x = 1;"))
  }

  test("q304 recovers every document's exact text at sf0.001") {
    val rows = graft.SparkEntry.queries("q304_html_extract")(spark, sf001).collect()
    assert(rows.length === 500)
    val texts = graft.schema.Tables.t(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(30).foreach { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(texts(r.getLong(0))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(r.getString(1) === hex)
    }
  }
}
