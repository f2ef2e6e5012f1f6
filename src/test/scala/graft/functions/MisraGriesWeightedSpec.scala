package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The weighted Misra–Gries sketch behind q179 — overflowed on a
  * synthetic weighted Zipf stream (vocabulary 5000 >> 2k counters) so the
  * prune/merge paths run, and the weighted superset guarantee (every item
  * with true weight > W/k survives) is checked adversarially. The
  * testdata's ~931-bigram vocabulary never prunes, q167-style. */
class MisraGriesWeightedSpec extends SparkSpec {

  // deterministic weighted Zipf-ish stream: item i appears ~N/(i+1)
  // times, each occurrence carrying a deterministic weight 1..13
  private def stream(nItems: Int, scale: Int): Seq[(String, Long)] =
    (0 until nItems).flatMap { i =>
      (0 until math.max(1, scale / (i + 1))).map { j =>
        (f"item$i%05d", ((i * 31 + j * 7) % 13 + 1).toLong)
      }
    }

  test("prune keeps every item with weight > W/k while bounding state") {
    val s = spark
    import s.implicits._
    val st = stream(5000, 2000)
    val k = 64
    val mg = MisraGriesWeighted(k)
    val (h1, h2) = st.splitAt(st.size / 2)
    def fold(part: Seq[(String, Long)]) = part.foldLeft(mg.zero) { (b, x) =>
      val b2 = mg.reduce(b, x)
      assert(b2.size <= 2 * k, s"buffer grew to ${b2.size} > ${2 * k}")
      b2
    }
    val merged = mg.merge(fold(h1), fold(h2))
    assert(merged.size <= 2 * k)
    assert(merged.size > k / 2, "prune degenerated to near-empty state")
    val exact = st.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val totalW = st.map(_._2).sum
    val mustKeep = exact.filter(_._2 > totalW.toDouble / k).keySet
    assert(mustKeep.nonEmpty, "test stream has no heavy hitters — not a real check")
    val cands = mg.finish(merged).toSet
    assert(mustKeep.subsetOf(cands),
      s"dropped heavy hitters: ${(mustKeep -- cands).take(5)} (guarantee broken)")
    // kept counts under-estimate true weight by < W/k — the mergeable bound
    merged.foreach { case (w, c) =>
      val t = exact(w)
      assert(c <= t, s"$w kept count $c exceeds true weight $t")
      assert(t - c < totalW.toDouble / k,
        s"$w decrement ${t - c} breaches the W/k=${totalW / k} bound")
    }
  }

  test("two-pass exact weighted top-10 over the sketch equals the exact top-10") {
    val s = spark
    import s.implicits._
    val df = stream(3000, 1500).toDF("item", "w")
    val sketch = MisraGriesWeighted(64)
    val cands = df.as[(String, Long)].select(sketch.toColumn).toDF("cands")
      .select(explode(col("cands")).as("item"))
    val got = df.join(broadcast(cands), Seq("item"))
      .groupBy(col("item")).agg(sum(col("w")).cast("long").as("wt"))
      .orderBy(col("wt").desc, col("item").asc)
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = df.groupBy(col("item")).agg(sum(col("w")).cast("long").as("wt"))
      .orderBy(col("wt").desc, col("item").asc)
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("non-positive weights add no mass and do not abort the pass") {
    val s = spark
    import s.implicits._
    val mg = MisraGriesWeighted(4)
    // A poisoned row is a no-op, not a task-killing exception — at
    // 100 TB one bad record must not abort the whole aggregation.
    assert(mg.reduce(mg.zero, ("bad", -1L)) == mg.zero)
    assert(mg.reduce(mg.zero, ("zero", 0L)) == mg.zero)
    // Positive mass around a poisoned row is still counted exactly.
    val b = Seq(("a", 5L), ("bad", -7L), ("a", 3L))
      .foldLeft(mg.zero)(mg.reduce)
    assert(b == Map("a" -> 8L))
  }
}
