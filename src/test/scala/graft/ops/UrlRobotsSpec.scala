package graft.ops

/** URL canonicalization and robots evaluation: every normalization class
  * and every REP decision rule pinned on hand-checked cases beyond the
  * schedule. */
class UrlRobotsSpec extends graft.SparkSpec {

  test("canonicalize handles each normalization class") {
    val c = UrlOps.canonicalize _
    assert(c("HTTP://EXAMPLE.TEST:80/a/./b?y=2&x=1#frag")
      === "http://example.test/a/b?x=1&y=2")
    assert(c("https://Example.test:443/x") === "https://example.test/x")
    assert(c("https://example.test:8443/x") === "https://example.test:8443/x")
    assert(c("http://h.test/%61/%7Ea?q=%31") === "http://h.test/a/~a?q=1")
    assert(c("http://h.test/a/%2Fb") === "http://h.test/a/%2Fb") // reserved: kept
    assert(c("http://h.test/a/%2fb") === "http://h.test/a/%2Fb") // hex upper-cased
    assert(c("http://h.test/a/b/c/../../d") === "http://h.test/a/d")
    assert(c("http://h.test") === "http://h.test/")
    assert(c("http://h.test/?b=2&a=1&") === "http://h.test/?a=1&b=2")
    intercept[IllegalArgumentException](c("ftp://h.test/x"))
    intercept[IllegalArgumentException](c("not a url"))
  }

  test("all schedule variants collapse to the canonical form") {
    (0L to 23L).foreach { id =>
      val sch = UrlOps.Schedule(id)
      (0 until sch.nVariants).foreach { v =>
        assert(UrlOps.canonicalize(sch.variant(v)) === sch.canonical,
          s"doc $id variant $v")
      }
    }
  }

  test("robots pattern matching: wildcards and the $ anchor") {
    val m = RobotsOps.matches _
    assert(m("/private/", "/private/x"))
    assert(!m("/private/", "/pub"))
    assert(m("/*.tmp$", "/a/b.tmp"))
    assert(!m("/*.tmp$", "/a/b.tmp.bak"))
    assert(m("/a*b*c", "/a-x-b-y-c-z")) // unanchored: match then anything
    assert(!m("/a*b$", "/a-x-b-y"))
    assert(m("/$", "/"))
    assert(!m("/$", "/x"))
  }

  test("robots precedence: longest rule wins, ties go to Allow") {
    val g = RobotsOps.Group(Seq("bot"), Seq(
      RobotsOps.Rule(allow = false, "/dir/"),
      RobotsOps.Rule(allow = true, "/dir/page"),
      RobotsOps.Rule(allow = false, "/same/"),
      RobotsOps.Rule(allow = true, "/tie0/"),
      RobotsOps.Rule(allow = false, "/tie0/")))
    assert(!RobotsOps.allowed(g, "/dir/other"))
    assert(RobotsOps.allowed(g, "/dir/page1")) // longer Allow overrides
    assert(RobotsOps.allowed(g, "/tie0/x")) // equal length: Allow wins
    assert(RobotsOps.allowed(g, "/elsewhere")) // no match: allowed
  }

  test("group selection prefers the specific agent over the catch-all") {
    val groups = RobotsOps.parseRobots(RobotsOps.Schedule(4L).robotsTxt)
    assert(groups.size === 2)
    val g = RobotsOps.selectGroup(groups, "graftbot").get
    assert(g.agents === Seq("graftbot"))
    // an unknown agent falls through to the trap group and loses everything
    val trap = RobotsOps.selectGroup(groups, "otherbot").get
    assert(trap.agents === Seq("*"))
    assert(!RobotsOps.allowed(trap, "/anything"))
  }

  test("q309/q310 run end-to-end at sf0.001") {
    val r9 = graft.SparkEntry.queries("q309_url_canonicalize")(spark, sf001).collect()
    assert(r9.length === 500)
    r9.foreach(r => assert(r.getLong(3) === 1L, s"doc ${r.getLong(0)} collapse"))
    val r10 = graft.SparkEntry.queries("q310_robots_filter")(spark, sf001).collect()
    assert(r10.length === 500)
    r10.take(20).foreach { r =>
      assert(r.getLong(3) === RobotsOps.Schedule(r.getLong(0)).expectedMask)
    }
  }
}
