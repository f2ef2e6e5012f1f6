package graft.ops

import org.apache.spark.sql.functions._

/** q340 UniMax: the paper's SEQUENTIAL ascending-size loop (Chung et al.
  * 2023 — fair share of the remaining budget, capped at E epochs) must
  * reproduce the windowed closed form exactly, and the structural
  * invariants must hold: every uncapped language carries the SAME
  * uniform share, capped languages sit at exactly E epochs, and the
  * allocations conserve the budget up to per-language rounding. */
class UnimaxSpec extends graft.SparkSpec {

  private val E = 2L

  test("windowed closed form equals the paper's sequential loop") {
    val s = spark
    import s.implicits._
    val toks = graft.schema.Tables.t(s, sf001, "documents")
      .select(col("lang"), size(TextCommon.wordsCol).cast("long").as("n"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val langs = toks.toSeq.sortBy { case (l, n) => (n, l) }
    val budget = 3L * langs.map(_._2).sum / 2L
    // the sequential walk: fair share of what remains, capped at E·n
    var remaining = budget.toDouble
    val seq = langs.zipWithIndex.map { case ((lang, n), i) =>
      val share = remaining / (langs.length - i)
      val capped = E * n <= share
      val alloc = if (capped) (E * n).toDouble else share
      remaining -= alloc
      (lang, n, i + 1L, capped, alloc)
    }
    val q = graft.SparkEntry.queries("q340_unimax_budget")(s, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))).toMap
    assert(q.keySet === toks.keySet)
    seq.foreach { case (lang, n, rnk, capped, alloc) =>
      val (qn, qrnk, qcap, qalloc) = q(lang)
      assert(qn === n, s"$lang tokens")
      assert(qrnk === rnk, s"$lang rank")
      assert(qcap === capped, s"$lang capped")
      assert(qalloc === math.round(alloc), s"$lang alloc")
    }
  }

  test("uniform share, epoch cap, and budget conservation") {
    val rows = graft.SparkEntry.queries("q340_unimax_budget")(spark, sf001)
      .collect()
    val budget = 3L * rows.map(_.getLong(1)).sum / 2L
    // at B = 1.5·T with E = 2 at least one language must be uncapped
    val (capped, uncapped) = rows.partition(_.getBoolean(3))
    assert(uncapped.nonEmpty)
    // capped languages sit at exactly E epochs
    capped.foreach { r =>
      assert(r.getLong(4) === E * r.getLong(1), r.getString(0))
      assert(r.getDouble(5) === E.toDouble, r.getString(0))
    }
    // every uncapped language carries the IDENTICAL uniform share
    assert(uncapped.map(_.getLong(4)).distinct.length === 1)
    // an uncapped language's cap must exceed its share (else it'd be capped)
    uncapped.foreach { r =>
      assert(E * r.getLong(1) > r.getLong(4), r.getString(0))
    }
    // allocations conserve the budget up to the uncapped rounding slack
    assert(math.abs(rows.map(_.getLong(4)).sum - budget) <= rows.length)
    // ranks really are the ascending-size order
    val byRank = rows.sortBy(_.getLong(2)).map(_.getLong(1))
    assert(byRank.sameElements(byRank.sorted))
  }
}
