package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `TextDedup.verifiedPairsFor` pinned against a brute-force reference
  * on randomized corpora plus the adversarial shapes: identical docs,
  * singleton sets, heavy df ties (every doc sharing one stop-shingle),
  * and pairs sitting exactly ON the 0.5 threshold. Written while A/B-ing
  * the AllPairs/PPJoin prefix-filtered variant (measured and REJECTED —
  * see jaccardPairsFrom's comment and SCALE.md round 13); kept because
  * the equality property is implementation-independent: whatever verify
  * join ships must reproduce exact Jaccard ≥ 0.5 pairs, boundary
  * included. */
class JaccardPrefixSpec extends SparkSpec {

  private def brute(sets: Map[Long, Set[Long]]): Set[(Long, Long, Double)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size
      jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if jac >= 0.5
    } yield (a, b, jac)).toSet
  }

  private def engine(sets: Map[Long, Set[Long]]): Set[(Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    val rows = sets.toSeq.flatMap { case (d, hh) => hh.map(h => (d, h)) }
    TextDedup.verifiedPairsFor(rows.toDF("doc_id", "h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("prefix-filtered pairs == brute force on randomized corpora") {
    for (seed <- Seq(7, 42, 1301)) {
      val rng = new scala.util.Random(seed)
      // small shingle pool forces overlap; sizes 1..30 cross every
      // prefix-length rounding case of |d| - ceil(|d|/2) + 1
      val sets = (1L to 60L).map { d =>
        val sz = 1 + rng.nextInt(30)
        d -> Iterator.continually(rng.nextInt(80).toLong).take(sz * 2)
          .toSet.take(sz)
      }.toMap
      assert(engine(sets) === brute(sets), s"diverged at seed $seed")
    }
  }

  test("adversarial shapes: duplicates, singletons, stop-shingle ties, exact threshold") {
    val sets = Map[Long, Set[Long]](
      1L -> Set(10L, 11L, 12L), // 1 and 2 identical (jac 1.0)
      2L -> Set(10L, 11L, 12L),
      3L -> Set(10L), // singleton sharing the ubiquitous shingle
      4L -> Set(10L), // identical singletons (jac 1.0)
      5L -> Set(10L, 11L, 13L), // vs doc 1: i=2, union 4 -> EXACTLY 0.5
      6L -> Set(10L, 20L, 21L, 22L), // vs doc 1: i=1 -> 1/6, filtered
      7L -> Set(30L, 31L, 32L, 33L, 34L, 35L) // disjoint tail
    )
    val got = engine(sets)
    assert(got === brute(sets))
    // the exact-boundary pair is present (>= , not >)
    assert(got.exists { case (a, b, j) => a == 1L && b == 5L && j == 0.5 })
  }
}
