package graft.ops

import org.apache.spark.sql.functions._

/** q345 trailing-loop detector: planted periodic suffixes through the
  * factored report (exact period, loop length, and the no-loop
  * direction), plus a full sequential recomputation of the top-20 over
  * the real corpus. */
class SuffixLoopSpec extends graft.SparkSpec {

  private def seqLoop(ws: Seq[String]): (Long, Long) = {
    // (best_period, loop_words) by the q345 convention
    val n = ws.length
    val cands = (1 to 8).map { p =>
      if (n <= p) (p, 0L)
      else {
        var m = 0
        var i = n - 1
        while (i >= p && ws(i) == ws(i - p)) { m += 1; i -= 1 }
        (p, if (m >= p) (m + p).toLong else 0L)
      }
    }
    val best = cands.maxBy { case (p, l) => (l, -p) }
    (best._1.toLong, best._2)
  }

  test("planted periodic suffixes: exact period and loop length") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma the the the the the"),          // p=1, loop 5
      (2L, "intro words yes no yes no yes no"),              // p=2, loop 6
      (3L, "a b c a b c a b c"),                             // p=3, loop 9 (whole doc)
      (4L, "all distinct words here nothing repeats at all"),// no loop
      (5L, "x y x"),                                         // m=1 < p=2 at best: p=1? x y x: p=2 trailing: w[2]=x=w[0] -> m=1 < 2 -> 0; p=1: y!=x -> 0
      (6L, "one two one two one two one two one two"))       // p=2, loop 10
      .toDF("doc_id", "text")
    val q = Curation.suffixLoopReport(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(q(1L) === ((1L, 5L, 0.625)))
    assert(q(2L) === ((2L, 6L, 0.75)))
    assert(q(3L) === ((3L, 9L, 1.0)))
    assert(q(4L)._2 === 0L)
    assert(q(5L)._2 === 0L)
    assert(q(6L) === ((2L, 10L, 1.0)))
    // the sequential reference agrees on every planted doc
    docs.as[(Long, String)].collect().foreach { case (id, t) =>
      val ws = t.toLowerCase.trim.split("\\s+").toSeq
      val (bp, l) = seqLoop(ws)
      assert((q(id)._1, q(id)._2) === ((bp, l)), s"doc $id")
    }
  }

  test("top-20 over the real corpus matches the sequential reference") {
    val s = spark
    import s.implicits._
    val docs = graft.schema.Tables.t(s, sf001, "documents")
      .select(col("doc_id"), TextCommon.wordsCol.as("ws"))
      .as[(Long, Seq[String])].collect()
    val expected = docs.map { case (id, ws) =>
      val (bp, l) = seqLoop(ws)
      (id, ws.length.toLong, bp, l, l.toDouble / ws.length)
    }.sortBy { case (id, _, _, _, f) => (-f, id) }.take(20)
      .map { case (id, n, bp, l, f) => (id, n, bp, l,
        BigDecimal(f).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val q = graft.SparkEntry.queries("q345_suffix_loop")(s, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(q.toSeq === expected.toSeq)
  }
}
