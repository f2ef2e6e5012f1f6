package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Link extraction — how the crawl frontier DISCOVERS urls: every
  * `<a href>` of a fetched page, entity-decoded, resolved against the
  * page's base url, and canonicalized with the same RFC 3986 engine the
  * dedup key uses (q309) — the stage that feeds q331's scheduler. The
  * reference has no page-level notion at all (`/root/reference/pkg/
  * converter/converter.go:52-57`); this completes the crawl loop
  * (discover → schedule → fetch → extract) per the north star.
  *
  * Strictness discipline (the q304/q322 shape): Spark renders each
  * document into the full boilerplate page and must recover the anchor
  * list through the REAL quote-aware tokenizer + attribute parser +
  * entity decoder + canonicalizer; the oracle reconstructs the expected
  * canonical url list and anchor texts CLOSED-FORM from the synth
  * schedule — any tokenizer drift (a '>' inside `title="k>0"` ending
  * the tag early, an undecoded `&amp;` in an href, an unsorted query
  * string) breaks the per-doc fingerprints.
  *
  * Scale shape: one per-doc codec seam (mapPartitions) emitting a
  * narrow (doc_id, host, n_links, fp, fp) row — pages never shuffle;
  * the only exchange is the presentation sort. At 100 TB the output
  * feeds the q331 frontier via one url-keyed dedup exchange.
  */
object LinkOps {

  val qs: Seq[Q] = Seq(

    // ---- q333: link extraction + canonical frontier feed ----
    Q("q333_link_extract", {
      // closed-form reconstruction from HtmlOps.htmlBytes: nav carries
      // Home, About, then (doc_id % 3) T-links whose hrefs canonicalize
      // with the bare 'gt' param FIRST (q309's total param order)
      val base = "'http://example-' || CAST(doc_id AS VARCHAR) || '.test'"
      val tails =
        """CASE doc_id % 3
          |      WHEN 0 THEN ''
          |      WHEN 1 THEN chr(10) || b || '/t?gt&x=0'
          |      ELSE chr(10) || b || '/t?gt&x=0' || chr(10) || b || '/t?gt&x=1'
          |    END""".stripMargin
      val anchorTails =
        """CASE doc_id % 3
          |      WHEN 0 THEN ''
          |      WHEN 1 THEN chr(10) || 'T0'
          |      ELSE chr(10) || 'T0' || chr(10) || 'T1'
          |    END""".stripMargin
      s"""WITH b0 AS (SELECT doc_id, $base AS b FROM documents),
         |e AS (SELECT doc_id,
         |    'example-' || CAST(doc_id AS VARCHAR) || '.test' AS host,
         |    CAST(2 + doc_id % 3 AS BIGINT) AS n_links,
         |    b || '/home' || chr(10) || b || '/about?q=1&r=2' || $tails AS urls,
         |    'Home' || chr(10) || 'About' || $anchorTails AS anchors
         |  FROM b0)
         |SELECT doc_id, host, n_links,
         |  md5(urls) AS links_fp, md5(anchors) AS anchors_fp
         |FROM e ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val page = new String(HtmlOps.htmlBytes(id, text), UTF_8)
          val doc = HtmlOps.extract(page)
          val host = s"example-$id.test"
          val canon = doc.anchors.map { case (href, _) =>
            UrlOps.canonicalize(
              if (href.startsWith("http://") || href.startsWith("https://")) href
              else s"http://$host$href")
          }
          (id, host, doc.anchors.length.toLong,
            Md5Hex.of(canon.mkString("\n")),
            Md5Hex.of(doc.anchors.map(_._2).mkString("\n")))
        })
        .toDF("doc_id", "host", "n_links", "links_fp", "anchors_fp")
        .orderBy(col("doc_id"))
    }
  )
}
