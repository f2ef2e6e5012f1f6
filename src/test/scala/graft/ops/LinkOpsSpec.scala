package graft.ops

/** q333's anchor extraction: attribute parsing traps (quotes, '>', '='
  * spacing, missing/unquoted href), entity decoding in hrefs and texts,
  * and document-order capture — hand-checked beyond the schedule. */
class LinkOpsSpec extends graft.SparkSpec {

  private def anchors(html: String) = HtmlOps.extract(html).anchors

  test("attribute parser handles the trap cases") {
    val a = HtmlOps.attrValue _
    assert(a("""a href="/x" title="k>0"""", "href") === Some("/x"))
    assert(a("""a title="href='/fake'" href='/real'""", "href") === Some("/real"))
    assert(a("""a HREF = "/case"""", "href") === Some("/case"))
    assert(a("""a href=bare""", "href") === None) // unquoted: absent
    assert(a("""a title="x"""", "href") === None)
    assert(a("""a xhref="/no"""", "href") === None) // needs word boundary
  }

  test("anchors come back in document order, decoded, href-less skipped") {
    val html = """<html><body>
      |<a href="/a?b=1&amp;c=2">First &amp; Co</a>
      |<a name="no-href">skip me</a>
      |<a href="http://other.test/abs">Abs</a>
      |</body></html>""".stripMargin
    assert(anchors(html) === List(
      ("/a?b=1&c=2", "First & Co"),
      ("http://other.test/abs", "Abs")))
  }

  test("anchors inside elided script/comment regions never surface") {
    val html = """<html><body>
      |<!-- <a href="/ghost">ghost</a> -->
      |<script>var s = '<a href="/ghost2">g</a>';</script>
      |<a href="/real">Real</a>
      |</body></html>""".stripMargin
    assert(anchors(html) === List(("/real", "Real")))
  }

  test("q333's per-doc fingerprints recompute sequentially") {
    val s = spark
    import s.implicits._
    val docs = graft.schema.Tables.t(s, sf001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().take(50)
    val q = graft.SparkEntry.queries("q333_link_extract")(s, sf001)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    docs.foreach { case (id, text) =>
      val page = new String(HtmlOps.htmlBytes(id, text),
        java.nio.charset.StandardCharsets.UTF_8)
      val canon = HtmlOps.extract(page).anchors.map { case (h, _) =>
        UrlOps.canonicalize(s"http://example-$id.test$h")
      }
      assert(q(id)._1 === canon.length.toLong, s"doc $id")
      assert(q(id)._2 === Md5Hex.of(canon.mkString("\n")), s"doc $id")
    }
  }
}
