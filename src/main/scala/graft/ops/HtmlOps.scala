package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** HTML main-content extraction — boilerplate removal, the stage between
  * [[WarcOps]] (crawl records) and everything the text families consume:
  * at 100 TB the quality of the whole corpus is set by how faithfully
  * page markup reduces to document text (the trafilatura/jusText layer).
  * The reference has no media/text path at all (`/root/reference/pkg/
  * converter/converter.go:52-57`); this extends the curation surface per
  * the north star.
  *
  * What is REAL here — a character-level tokenizer, not a regex strip:
  *   - comment elision (`<!-- -->`, including fake tags inside);
  *   - script/style elision to the matching close tag (their bodies
  *     contain raw `<`, `>`, `&&` that a naive stripper would mangle);
  *   - tag scanning that respects QUOTED attribute values (a `>` inside
  *     `href="...>..."` must not terminate the tag);
  *   - character-entity decoding in text nodes and the title — named
  *     (`&amp; &lt; &gt; &quot; &apos; &nbsp; &copy; &mdash;`) and
  *     numeric (`&#NNN;` / `&#xHH;`) forms;
  *   - structural extraction: content is the text inside `<p>` elements
  *     within `<main>` only — nav/footer/header paragraphs are
  *     boilerplate by position, the core main-content heuristic.
  *
  * Correctness is strict end-to-end against the REAL text column: the
  * synthesized page embeds the document's text entity-ESCAPED inside the
  * main paragraph, surrounded by boilerplate (nav links, comments,
  * scripts with fake tags, footer paragraphs, entities everywhere);
  * Spark extracts and md5s the recovered content, while the oracle
  * simply md5s the ORIGINAL text — the escape→tokenize→decode chain must
  * be the exact identity for every document or the hashes diverge.
  */
object HtmlOps {

  // --------------------------------------------------------- schedule

  private[ops] final case class Schedule(id: Long) {
    val extraLinks: Int = (id % 3).toInt
    val extraParagraphs: Int = (id % 4).toInt
    val nLinks: Int = 2 + extraLinks
    val nParagraphs: Int = 1 + extraParagraphs
  }

  // ------------------------------------------------------------- synth

  /** Minimal-entity escape — the exact inverse of [[decodeEntities]] on
    * any input (all `&`, `<`, `>` are escaped, so no decoded form is
    * ambiguous). */
  private[ops] def escapeText(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** A real page for one document: head with title/style/script (bodies
    * full of fake tags), nav boilerplate links, a comment containing
    * markup, ONE main paragraph holding the entity-escaped document text
    * verbatim, and footer boilerplate paragraphs + entities. */
  private[ops] def htmlBytes(id: Long, text: String): Array[Byte] = {
    val sch = Schedule(id)
    val sb = new StringBuilder(1024)
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n")
    sb.append(s"<title>Doc $id &mdash; graft</title>\n")
    sb.append("<style>body { color: #000; } a > span { margin: 0; }</style>\n")
    sb.append("<script>if (a < b && c > d) { x = \"<p>fake</p>\"; }</script>\n")
    sb.append("</head>\n<body>\n<nav>")
    sb.append("<a href=\"/home\">Home</a><a href=\"/about?q=1&amp;r=2\">About</a>")
    (0 until sch.extraLinks).foreach { k =>
      // a '>' inside a quoted attribute value — the tag-scanner trap
      sb.append(s"""<a href="/t?x=$k&amp;gt" title="k>$k">T$k</a>""")
    }
    sb.append("</nav>\n<!-- boilerplate <p>not content</p> & junk -->\n<main>\n")
    sb.append("<h1>Headline ").append(id).append("</h1>\n")
    sb.append("<p class=\"content\">").append(escapeText(Option(text).getOrElse("")))
    sb.append("</p>\n</main>\n<footer>\n")
    (0 until sch.extraParagraphs).foreach { k =>
      sb.append(s"<p>boilerplate &#$k${";"} &copy; 2026</p>\n")
    }
    sb.append("&nbsp;example-").append(id).append(".test &amp; partners\n")
    sb.append("</footer>\n</body>\n</html>\n")
    sb.toString.getBytes(UTF_8)
  }

  // ------------------------------------------------------------- parse

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "mdash" -> "—")

  /** Decode character entities: named from the table, `&#NNN;` decimal,
    * `&#xHH;` hex; an unknown or unterminated entity passes through
    * verbatim (the browser posture — crawl HTML is full of bare `&`). */
  private[ops] def decodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val handled = semi > i && semi - i <= 10 && {
          val body = s.substring(i + 1, semi)
          // out-of-range code points pass through verbatim like any other
          // unknown entity — one malformed &#...; must not lose the page
          if (body.startsWith("#x") || body.startsWith("#X")) {
            val h = body.substring(2)
            h.nonEmpty && h.forall(ch => Character.digit(ch, 16) >= 0) && {
              val cp = java.lang.Long.parseLong(h, 16)
              cp <= 0x10ffff && Character.isValidCodePoint(cp.toInt) && {
                sb.appendAll(Character.toChars(cp.toInt)); true
              }
            }
          } else if (body.startsWith("#")) {
            val d = body.substring(1)
            d.nonEmpty && d.forall(_.isDigit) && {
              val cp = d.toLong
              cp <= 0x10ffff && Character.isValidCodePoint(cp.toInt) && {
                sb.appendAll(Character.toChars(cp.toInt)); true
              }
            }
          } else Named.get(body).exists { r => sb.append(r); true }
        }
        if (handled) i = semi + 1
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Extracted page facts. `anchors` carries every `<a>` in document
    * order as (entity-decoded href, entity-decoded anchor text) — the
    * frontier-discovery payload q333 consumes. */
  private[ops] final case class HtmlDoc(
      title: String, content: String, nLinks: Long, nParagraphs: Long,
      anchors: List[(String, String)] = Nil)

  /** First quoted value of attribute `name` in a tag's inner text —
    * quote-aware (a '>' or another attribute name inside a quoted value
    * must not match), case-insensitive, whitespace-tolerant around '='. */
  private[ops] def attrValue(inner: String, name: String): Option[String] = {
    var j = 0
    var quote: Char = 0
    while (j < inner.length) {
      val ch = inner.charAt(j)
      if (quote != 0) { if (ch == quote) quote = 0; j += 1 }
      else if (ch == '"' || ch == '\'') { quote = ch; j += 1 }
      else if (inner.regionMatches(true, j, name, 0, name.length) &&
        (j == 0 || inner.charAt(j - 1).isWhitespace)) {
        var k = j + name.length
        while (k < inner.length && inner.charAt(k).isWhitespace) k += 1
        if (k < inner.length && inner.charAt(k) == '=') {
          k += 1
          while (k < inner.length && inner.charAt(k).isWhitespace) k += 1
          if (k < inner.length && (inner.charAt(k) == '"' || inner.charAt(k) == '\'')) {
            val q = inner.charAt(k)
            val end = inner.indexOf(q, k + 1)
            if (end > k) return Some(inner.substring(k + 1, end))
          }
          return None // unquoted or malformed value: treat as absent
        } else j += 1
      } else j += 1
    }
    None
  }

  /** The tokenizer: one forward pass with comment/script/style elision,
    * quote-aware tag scanning, and positional content capture (text
    * nodes inside `<p>` within `<main>`). Entities are decoded on the
    * captured buffers at the end (no entity spans a tag boundary in
    * well-formed markup). */
  private[ops] def extract(html: String): HtmlDoc = {
    val title = new StringBuilder
    val content = new StringBuilder
    val anchors = List.newBuilder[(String, String)]
    val anchorText = new StringBuilder
    var anchorHref: Option[String] = None
    var nLinks = 0L; var nParagraphs = 0L
    var inTitle = false; var inMain = false; var inP = false; var inA = false
    var i = 0
    val n = html.length

    def tagEnd(from: Int): Int = { // quote-aware scan to the closing '>'
      var j = from
      var quote: Char = 0
      while (j < n && (quote != 0 || html.charAt(j) != '>')) {
        val ch = html.charAt(j)
        if (quote == 0 && (ch == '"' || ch == '\'')) quote = ch
        else if (ch == quote) quote = 0
        j += 1
      }
      require(j < n, s"unterminated tag at $from")
      j
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          require(e >= 0, s"unterminated comment at $i")
          i = e + 3
        } else {
          val e = tagEnd(i + 1)
          val inner = html.substring(i + 1, e)
          val isClose = inner.startsWith("/")
          val name = (if (isClose) inner.substring(1) else inner)
            .takeWhile(ch => !ch.isWhitespace && ch != '/').toLowerCase
          if (!isClose && (name == "script" || name == "style")) {
            val close = s"</$name>"
            val ce = html.indexOf(close, e + 1)
            require(ce >= 0, s"unterminated <$name> at $i")
            i = ce + close.length
          } else {
            (isClose, name) match {
              case (false, "title") => inTitle = true
              case (true, "title") => inTitle = false
              case (false, "main") => inMain = true
              case (true, "main") => inMain = false
              case (false, "p") => inP = true; nParagraphs += 1
              case (true, "p") => inP = false
              case (false, "a") =>
                nLinks += 1
                inA = true; anchorText.setLength(0)
                anchorHref = attrValue(inner, "href")
              case (true, "a") =>
                inA = false
                anchorHref.foreach { h =>
                  anchors += ((decodeEntities(h), decodeEntities(anchorText.toString)))
                }
                anchorHref = None
              case _ => ()
            }
            i = e + 1
          }
        }
      } else {
        if (inTitle) title.append(c)
        else if (inMain && inP) content.append(c)
        if (inA) anchorText.append(c)
        i += 1
      }
    }
    HtmlDoc(decodeEntities(title.toString), decodeEntities(content.toString),
      nLinks, nParagraphs, anchors.result())
  }

  // ------------------------------------------------------------ queries

  val qs: Seq[Q] = Seq(

    // ---- HTML main-content extraction audit ----
    // Spark renders each document into a full boilerplate-laden page
    // (escaped text in the main paragraph) and EXTRACTS it back with the
    // tokenizer; the oracle md5s the ORIGINAL text column. The recovered
    // content must be the byte-exact identity for every document — any
    // tokenizer, elision, entity, or capture defect breaks the hashes.
    Q("q304_html_extract",
      """SELECT doc_id,
        |  md5(coalesce(text, '')) AS text_md5,
        |  CAST(len(coalesce(text, '')) AS BIGINT) AS text_len,
        |  CAST(12 + len(CAST(doc_id AS VARCHAR)) AS BIGINT) AS title_len,
        |  CAST(2 + doc_id % 3 AS BIGINT) AS n_links,
        |  CAST(1 + doc_id % 4 AS BIGINT) AS n_paragraphs
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val page = new String(htmlBytes(id, text), UTF_8)
          val doc = extract(page)
          (id, Md5Hex.of(doc.content), Md5Hex.codePoints(doc.content),
            Md5Hex.codePoints(doc.title), doc.nLinks, doc.nParagraphs)
        })
        .toDF("doc_id", "text_md5", "text_len", "title_len", "n_links",
          "n_paragraphs")
        .orderBy(col("doc_id"))
    }
  )
}
