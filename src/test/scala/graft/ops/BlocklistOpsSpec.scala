package graft.ops

/** Aho–Corasick unit pins (the failure modes the oracle hash would also
  * catch, isolated here with hand-checkable strings) plus the q324
  * corpus contract. */
class BlocklistOpsSpec extends graft.SparkSpec {

  private def matchesOf(pats: Seq[String], text: String): Seq[(String, Int)] = {
    val ac = new BlocklistOps.AhoCorasick(pats.toIndexedSeq)
    val out = Seq.newBuilder[(String, Int)]
    ac.scan(text) { (pid, end) =>
      out += ((pats(pid), end - pats(pid).length + 2)) // 1-based start
    }
    out.result().sorted
  }

  test("nested patterns surface through output links") {
    // 'at' must be reported INSIDE every 'data' occurrence
    assert(matchesOf(Seq("at", "data"), "data data") ===
      Seq(("at", 2), ("at", 7), ("data", 1), ("data", 6)))
  }

  test("fail links recover partial matches after a mismatch") {
    // after reading "dat" the automaton is deep in 'data'; the next 'a'
    // fails and must fall back so the following "at" still matches
    assert(matchesOf(Seq("data", "tat"), "datat") ===
      Seq(("data", 1), ("tat", 3)))
  }

  test("overlapping occurrences of a self-bordered pattern are all found") {
    // the audit set is self-border-free by design, but the AUTOMATON must
    // still handle overlap correctly (this is what position-counting
    // means): 'aa' in 'aaa' occurs at 1 and 2
    assert(matchesOf(Seq("aa"), "aaa") === Seq(("aa", 1), ("aa", 2)))
  }

  test("no pattern in the audit set has a self-border") {
    BlocklistOps.Patterns.foreach { p =>
      (1 until p.length).foreach { k =>
        assert(!(p.take(k) == p.takeRight(k)),
          s"'$p' has border '${p.take(k)}' — the oracle's replace-count " +
            "formula would undercount overlapping occurrences")
      }
    }
  }

  test("randomized automata equal the indexOf scan (200 seeded cases)") {
    // property pin over a tiny alphabet (dense overlaps, self-bordered
    // patterns, patterns inside patterns): every (pattern, start) the
    // automaton reports must equal the exhaustive indexOf enumeration
    val rng = new scala.util.Random(0x5eed5eedL)
    (1 to 200).foreach { k =>
      val nPats = 2 + rng.nextInt(3)
      val pats = Seq.fill(nPats)(
        Seq.fill(1 + rng.nextInt(4))(('a' + rng.nextInt(2)).toChar).mkString)
        .distinct
      val text = Seq.fill(10 + rng.nextInt(60))(
        ('a' + rng.nextInt(2)).toChar).mkString
      val expected = pats.flatMap { p =>
        Iterator.iterate(text.indexOf(p))(i => text.indexOf(p, i + 1))
          .takeWhile(_ >= 0).map(i => (p, i + 1)).toSeq
      }.sorted
      assert(matchesOf(pats, text) === expected, s"case $k pats=$pats text=$text")
    }
  }

  test("q324 equals a sequential indexOf scan and both labels occur") {
    val rows = graft.SparkEntry.queries("q324_blocklist_filter")(spark, sf001)
      .collect()
    val docs = graft.schema.Tables.t(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val text = docs(r.getLong(0))
      var hits = 0L; var nPats = 0L; var first = Int.MaxValue
      BlocklistOps.Patterns.foreach { p =>
        var i = text.indexOf(p); var c = 0L
        while (i >= 0) { c += 1; if (i + 1 < first) first = i + 1
          i = text.indexOf(p, i + 1) } // overlapping: advance by ONE
        hits += c; if (c > 0) nPats += 1
      }
      assert(r.getLong(1) === hits, s"doc ${r.getLong(0)} n_hits")
      assert(r.getLong(2) === nPats, s"doc ${r.getLong(0)} n_patterns")
      assert(r.getLong(3) === (if (first == Int.MaxValue) 0L else first.toLong),
        s"doc ${r.getLong(0)} first_hit")
    }
    val labels = rows.map(_.getString(4)).toSet
    assert(labels === Set("block", "keep"),
      s"threshold ${BlocklistOps.BlockAt} must split the corpus, got $labels")
  }
}
