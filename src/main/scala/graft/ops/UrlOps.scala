package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** URL canonicalization (RFC 3986 §6) — the key that URL-level dedup
  * hangs on: a crawl frontier sees the same resource under case-varied
  * schemes/hosts, default ports, dot-segments, gratuitous percent-
  * encoding, shuffled query order, and fragments; canonicalization must
  * collapse all of them BEFORE content ever downloads (q62 scrubs URLs
  * in text and q175 decomposes them — this is the normalization that
  * makes them JOINABLE). The reference has no URL handling
  * (`/root/reference/pkg/converter/converter.go:52-57`).
  *
  * The normalizer applies, in order:
  *   - scheme and host case-folding (RFC 3986 §6.2.2.1);
  *   - default-port elision (http:80 / https:443, §6.2.3);
  *   - percent-decoding of UNRESERVED characters only, and upper-casing
  *     of the hex digits of escapes that must remain (§6.2.2.2);
  *   - dot-segment removal over the path (`.` and `..`, the §5.2.4
  *     remove_dot_segments algorithm);
  *   - query-parameter sort (a crawl-side convention, not RFC — two
  *     frontiers must agree on SOME total order, and key-then-value sort
  *     is the standard choice);
  *   - fragment removal (never sent to the server).
  *
  * Strictness: each document generates 2–4 deterministically MESSY
  * variants of its canonical URL (every corruption class above); the
  * query canonicalizes all of them and asserts they COLLAPSE to one
  * string, which the oracle states closed-form. A normalizer defect in
  * any class either breaks the collapse count or the canonical string.
  */
object UrlOps {

  // --------------------------------------------------------- schedule

  private[ops] final case class Schedule(id: Long) {
    val seg: Long = id % 7
    val canonical: String = s"http://example-$id.test/p$seg/b?x=1&y=2"
    val nVariants: Int = (2 + id % 3).toInt
    /** Deterministic messy variants, each exercising a corruption class. */
    def variant(v: Int): String = (v % 4) match {
      case 0 => s"HTTP://EXAMPLE-$id.TEST:80/p$seg/./b?y=2&x=1#frag"
      case 1 => s"http://example-$id.test/p$seg/dead/../b?x=1&y=2"
      case 2 => s"http://example-$id.test/%70$seg/b?x=%31&y=2" // %70='p', %31='1'
      case _ => s"http://EXAMPLE-$id.test:80/p$seg/b?y=2&x=1"
    }
  }

  // ------------------------------------------------------ canonicalize

  private def isUnreserved(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '-' || c == '.' || c == '_' || c == '~'

  /** Percent-decode unreserved escapes; uppercase the hex of kept ones. */
  private[ops] def normalizeEscapes(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        val v = Integer.parseInt(hex, 16)
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%').append(hex.toUpperCase)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[ops] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    path.split("/", -1).foreach {
      case "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    val joined = out.mkString("/")
    if (path.startsWith("/") && !joined.startsWith("/")) "/" + joined else joined
  }

  /** Full canonicalization of an absolute http(s) URL. */
  private[ops] def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    require(schemeEnd > 0, s"not an absolute URL: $url")
    val scheme = url.substring(0, schemeEnd).toLowerCase
    require(scheme == "http" || scheme == "https", s"unsupported scheme $scheme")
    val rest = url.substring(schemeEnd + 3)
    val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case k => k
    }
    var authority = rest.substring(0, authEnd).toLowerCase
    val defaultPort = if (scheme == "http") ":80" else ":443"
    if (authority.endsWith(defaultPort))
      authority = authority.substring(0, authority.length - defaultPort.length)
    var tail = rest.substring(authEnd)
    val hashAt = tail.indexOf('#') // fragment: dropped
    if (hashAt >= 0) tail = tail.substring(0, hashAt)
    val qAt = tail.indexOf('?')
    val rawPath = if (qAt >= 0) tail.substring(0, qAt) else tail
    val path = removeDotSegments(normalizeEscapes(
      if (rawPath.isEmpty) "/" else rawPath))
    val query = if (qAt >= 0) {
      val params = normalizeEscapes(tail.substring(qAt + 1))
        .split("&", -1).filter(_.nonEmpty).sorted
      if (params.isEmpty) "" else "?" + params.mkString("&")
    } else ""
    s"$scheme://$authority$path$query"
  }

  // ------------------------------------------------------------ queries

  val qs: Seq[Q] = Seq(

    // ---- URL canonicalization collapse audit ----
    // Every document's messy variants (case, default port, dot-segments,
    // percent-noise, shuffled query, fragment) must canonicalize to ONE
    // string, stated closed-form by the oracle. distinct_canon != 1 or a
    // wrong canonical both break the hashes.
    Q("q309_url_canonicalize",
      """SELECT doc_id,
        |  'http://example-' || CAST(doc_id AS VARCHAR) || '.test/p' ||
        |      CAST(doc_id % 7 AS VARCHAR) || '/b?x=1&y=2' AS canonical,
        |  CAST(2 + doc_id % 3 AS BIGINT) AS n_variants,
        |  CAST(1 AS BIGINT) AS distinct_canon
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions(_.map { id =>
          val sch = Schedule(id)
          val canon = (0 until sch.nVariants).map(v => canonicalize(sch.variant(v)))
          (id, canon.head, sch.nVariants.toLong, canon.distinct.size.toLong)
        })
        .toDF("doc_id", "canonical", "n_variants", "distinct_canon")
        .orderBy(col("doc_id"))
    }
  )
}
