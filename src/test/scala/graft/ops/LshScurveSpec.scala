package graft.ops

import org.apache.spark.sql.functions._

/** q341 LSH S-curve audit: a driver-side brute-force recomputation of
  * every config's candidate set from the collected signatures, the
  * aligned-band NESTING theorem (agreement on a longer band implies
  * agreement on its sub-bands), and the resulting monotonicity of
  * candidate counts and recall across the (bands × rows) ladder. */
class LshScurveSpec extends graft.SparkSpec {

  private val configs = Seq((8, 1), (4, 2), (2, 4), (1, 8))

  private def signatures(sf: String): Map[Long, Seq[Long]] = {
    val s = spark
    import s.implicits._
    TextDedup.signatureFrame(
        TextDedup.shingleRowsFor(graft.schema.Tables.t(s, sf, "documents")), 8)
      .as[(Long, Seq[Long])].collect().toMap
  }

  private def bruteCandidates(sigs: Map[Long, Seq[Long]], b: Int, r: Int): Set[(Long, Long)] = {
    val ids = sigs.keys.toArray.sorted
    (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      (a, c) = (ids(i), ids(j))
      if (0 until b).exists(band =>
        (band * r until (band + 1) * r).forall(t => sigs(a)(t) == sigs(c)(t)))
    } yield (a, c)).toSet
  }

  test("per-config candidate sets match a brute-force over the signatures") {
    val s = spark
    import s.implicits._
    val sigs = signatures(sf001)
    val q = graft.SparkEntry.queries("q341_lsh_scurve")(s, sf001)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        r.getLong(2)).toMap
    configs.foreach { case (b, r) =>
      assert(q((b, r)) === bruteCandidates(sigs, b, r).size.toLong, s"($b,$r)")
    }
  }

  test("aligned bands nest: C(1,8) ⊆ C(2,4) ⊆ C(4,2) ⊆ C(8,1)") {
    val sigs = signatures(sf001)
    val sets = configs.map { case (b, r) => bruteCandidates(sigs, b, r) }
    sets.sliding(2).foreach { case Seq(wider, narrower) =>
      assert(narrower.subsetOf(wider))
    }
  }

  test("counts/recall are monotone, ratios bounded, prediction sane") {
    val rows = graft.SparkEntry.queries("q341_lsh_scurve")(spark, sf001)
      .collect().sortBy(-_.getLong(0))   // widest (8,1) first
    // one shared truth count across all configs
    assert(rows.map(_.getLong(4)).distinct.length === 1)
    val t = rows.head.getLong(4)
    assert(t > 0)
    rows.sliding(2).foreach { case Array(wider, narrower) =>
      assert(wider.getLong(2) >= narrower.getLong(2))   // candidates
      assert(wider.getLong(3) >= narrower.getLong(3))   // true candidates
      assert(wider.getDouble(5) >= narrower.getDouble(5)) // recall
      // the theoretical capture is monotone in b at fixed k too
      assert(wider.getDouble(7) >= narrower.getDouble(7))
    }
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(3) <= t)
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1)
      assert(r.getDouble(7) >= 0 && r.getDouble(7) <= 1)
      assert(r.getDouble(8) > 0 && r.getDouble(8) <= 1)
    }
    // s50 falls as bands widen — the S-curve slides left
    val s50s = rows.map(_.getDouble(8))
    assert(s50s.sameElements(s50s.sorted))
  }
}
