package graft.ops

/** WARC walk: the synthesized segment must parse back per its schedule
  * (including the gzip member-per-record form, which exercises the JDK
  * inflater's multi-member chaining), and structural corruption must
  * throw rather than salvage. */
class WarcOpsSpec extends graft.SparkSpec {

  test("parse round-trips the schedule, plain and gzipped") {
    (0L to 59L).foreach { id =>
      val sch = WarcOps.Schedule(id)
      val i = WarcOps.parse(WarcOps.warcBytes(id))
      assert(i.nRecords === sch.nRecords.toLong, s"doc $id records")
      assert(i.nResponse === sch.nResp.toLong, s"doc $id responses")
      assert(i.nOk === (0 until sch.nResp).count(sch.ok).toLong, s"doc $id ok")
      assert(i.totalBodyBytes === (0 until sch.nResp).map(sch.bodyLen(_).toLong).sum)
      val chk = (for {
        r <- 0 until sch.nResp
        j <- 0 until sch.bodyLen(r)
      } yield (j + 1).toLong * sch.bodyByte(r, j)).sum
      assert(i.bodyChk === chk, s"doc $id body checksum")
      assert(i.gzipped === (if (sch.gzipped) 1L else 0L))
    }
  }

  test("gzip member-per-record really is multiple members") {
    // an odd id is gzipped per record; count gzip magics in the raw bytes
    val bytes = WarcOps.warcBytes(1L)
    val members = bytes.indices.count(k =>
      k + 1 < bytes.length && (bytes(k) & 0xff) == 0x1f && (bytes(k + 1) & 0xff) == 0x8b)
    assert(members === WarcOps.Schedule(1L).nRecords,
      "every record must be its own gzip member")
  }

  test("structural corruption throws instead of salvaging") {
    val plain = WarcOps.warcBytes(2L) // even id: not gzipped
    // wrong version line
    val bad = plain.clone(); bad(5) = '9'
    assert(intercept[IllegalArgumentException](WarcOps.parse(bad))
      .getMessage.contains("version"))
    // truncation mid-payload: the Content-Length walk must overrun loudly
    intercept[IllegalArgumentException](WarcOps.parse(plain.dropRight(7)))
    // corrupt a record separator (last 4 bytes are CRLF CRLF)
    val sep = plain.clone(); sep(sep.length - 2) = 'X'
    intercept[IllegalArgumentException](WarcOps.parse(sep))
  }

  test("the crawl pipeline recovers exact text through all three layers") {
    Seq(0L, 1L, 2L, 3L, 4L, 5L).foreach { id =>
      val text = s"document $id content with words"
      val (info, responses) = WarcOps.walk(WarcOps.crawlBytes(id, text))
      assert(info.nResponse === 2L + id % 3, s"doc $id responses")
      val pages = responses.filter(r =>
        r.statusCode == 200 && r.contentType.startsWith("text/html"))
      assert(pages.size === 1, s"doc $id html pages")
      val recovered = HtmlOps.extract(new String(pages.head.body,
        java.nio.charset.StandardCharsets.UTF_8)).content
      assert(recovered === text, s"doc $id text through gzip+WARC+HTML")
    }
  }

  test("q303 runs end-to-end and matches the schedule") {
    val rows = graft.SparkEntry.queries("q303_warc_records")(spark, sf001).collect()
    assert(rows.length === 500)
    rows.take(30).foreach { r =>
      val sch = WarcOps.Schedule(r.getLong(0))
      assert(r.getLong(1) === sch.nRecords.toLong)
      assert(r.getLong(2) === sch.nResp.toLong)
    }
  }

  test("q322 is consistent with its sibling stage queries per host shard") {
    // composition check (the q315 discipline): the report's per-host
    // sums must equal regrouping the SIBLING queries' per-doc outputs
    val byHost = graft.SparkEntry.queries("q310_robots_filter")(spark, sf001)
      .collect().map(r => (r.getLong(0) % 50, r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val urls = graft.SparkEntry.queries("q309_url_canonicalize")(spark, sf001)
      .collect().map(r => (r.getLong(0) % 50, r.getLong(2))).groupBy(_._1)
    val texts = graft.schema.Tables.t(spark, sf001, "documents")
      .selectExpr("doc_id % 50 AS h",
        "CAST(length(coalesce(text, '')) AS LONG) AS n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val rows = graft.SparkEntry.queries("q322_crawl_quality_report")(spark, sf001)
      .collect()
    assert(rows.length === 50)
    var blocked = false
    rows.foreach { r =>
      val h = r.getString(0).stripPrefix("crawl-").stripSuffix(".test").toLong
      assert(r.getLong(1) === byHost(h).length.toLong, s"host $h n_docs")
      assert(r.getLong(2) === byHost(h).map(_._2).sum, s"host $h n_probes")
      val rate = BigDecimal(1.0 - byHost(h).map(_._3).sum.toDouble /
        byHost(h).map(_._2).sum).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getDouble(3) === rate.toDouble, s"host $h block rate")
      if (r.getDouble(3) > 0) blocked = true
      // charset mix partitions the host's docs
      assert((4 to 7).map(r.getLong).sum === r.getLong(1), s"host $h charset mix")
      assert(r.getLong(8) === texts(h).map(_._2).sum, s"host $h clean chars")
      assert(r.getLong(11) === urls(h).map(_._2).sum, s"host $h n_urls")
      assert(r.getLong(12) === byHost(h).length.toLong, s"host $h canonicals")
      assert(r.getDouble(10) > 0 && r.getDouble(10) < 1, s"host $h yield")
    }
    assert(blocked, "no host shows a nonzero robots-block rate")
  }

  test("q322 plan: codec seam into one per-host aggregate, no joins") {
    val p = graft.SparkEntry.queries("q322_crawl_quality_report")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.toLowerCase.contains("cartesian"),
      s"the snapshot report must not join:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
    // the distinct-canonical pre-aggregation plus the host aggregate plus
    // the 50-row presentation sort — nothing corpus-sized beyond them
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected ≤3 exchanges, got $exchanges:\n$p")
    assert(p.contains("hashpartitioning(host"),
      s"aggregate not keyed on host:\n$p")
  }
}
