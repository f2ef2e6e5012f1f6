package graft.ops

/** q343 composed decontamination decision: the flagged set must be the
  * exact UNION of the two component screens' flags (recomputed from the
  * oracle-checked q222/q342 outputs), every reason must match its
  * component memberships, and the −2.0 no-embedding sentinel must never
  * collide with a real cosine. */
class DecontamDecisionSpec extends graft.SparkSpec {

  test("flagged set is the union of the component screens") {
    val s = spark
    // lexical: q222 rows where RAW n_hit/n_grams >= 0.5 (q222 reports
    // only n_hit > 0 rows, which every >= 0.5 flag necessarily is)
    val lex = graft.SparkEntry.queries("q222_contamination")(s, sf001)
      .collect()
      .filter(r => r.getLong(2).toDouble / r.getLong(1) >= 0.5)
      .map(_.getLong(0)).toSet
    // semantic: q342's report IS the >= 0.35 flag set
    val sem = graft.SparkEntry.queries("q342_semantic_decontam")(s, sf001)
      .collect().map(_.getLong(0)).toSet
    val q = graft.SparkEntry.queries("q343_decontam_decision")(s, sf001)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(q.keySet === (lex ++ sem))
    q.foreach { case (id, reason) =>
      val expected =
        if (lex(id) && sem(id)) "lexical+semantic"
        else if (lex(id)) "lexical" else "semantic"
      assert(reason === expected, s"doc $id")
    }
    // both screens contribute on this corpus
    assert(lex.nonEmpty && sem.nonEmpty)
  }

  test("sentinel and range discipline on max_cos") {
    val rows = graft.SparkEntry.queries("q343_decontam_decision")(spark, sf001)
      .collect()
    rows.foreach { r =>
      val (hasEmb, mc) = (r.getBoolean(4), r.getDouble(5))
      if (hasEmb) assert(mc >= -1.0 - 1e-9 && mc <= 1.0 + 1e-9, r.getLong(0).toString)
      else assert(mc === -2.0, r.getLong(0).toString)
      // a semantic reason requires an embedding above threshold
      if (r.getString(6).contains("semantic"))
        assert(hasEmb && mc >= 0.35 - 5e-7, r.getLong(0).toString)
      // a lexical reason requires the raw ratio bar
      if (r.getString(6).contains("lexical"))
        assert(r.getLong(2).toDouble / r.getLong(1) >= 0.5, r.getLong(0).toString)
    }
    // presentation order
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }
}
