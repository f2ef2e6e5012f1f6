package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `graft.textdedup.verifyBatchUnits` (VERDICT r13 item 1) must be
  * output-invariant: the verify join's intersection counts decompose
  * exactly over disjoint shingle-hash buckets, so ANY budget — including
  * one forcing many single-shingle-ish passes — yields byte-identical
  * pairs and Jaccard values. Checked against the unbatched path (itself
  * pinned to brute force in JaccardPrefixSpec), on randomized corpora and
  * the adversarial shapes, plus pass-count arithmetic on the ΣC(df,2)
  * mass. */
class JaccardBatchSpec extends SparkSpec {

  private def pairs(sets: Map[Long, Set[Long]], budget: Option[Long])
      : Seq[(Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    budget match {
      case Some(p) => s.conf.set("graft.textdedup.verifyBatchUnits", p.toString)
      case None => s.conf.unset("graft.textdedup.verifyBatchUnits")
    }
    try {
      val rows = sets.toSeq.flatMap { case (d, hh) => hh.map(h => (d, h)) }
      TextDedup.verifiedPairsFor(rows.toDF("doc_id", "h"))
        .orderBy("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    } finally s.conf.unset("graft.textdedup.verifyBatchUnits")
  }

  test("batched == direct on randomized corpora at forced multi-pass budgets") {
    for (seed <- Seq(7, 42, 1301)) {
      val rng = new scala.util.Random(seed)
      val sets = (1L to 60L).map { d =>
        val sz = 1 + rng.nextInt(30)
        d -> Iterator.continually(rng.nextInt(80).toLong).take(sz * 2)
          .toSet.take(sz)
      }.toMap
      val direct = pairs(sets, None)
      // ~10k units here (rows + pairs): 3000 → ~4 passes, 800 → ~13;
      // 10_000_000 collapses to the single-pass (b == 1) branch
      for (budget <- Seq(3000L, 800L, 10000000L))
        assert(pairs(sets, Some(budget)) === direct,
          s"diverged at seed $seed budget $budget")
    }
  }

  test("batched == direct on adversarial shapes (dups, singletons, threshold)") {
    val sets = Map[Long, Set[Long]](
      1L -> Set(10L, 11L, 12L),
      2L -> Set(10L, 11L, 12L),
      3L -> Set(10L),
      4L -> Set(10L),
      5L -> Set(10L, 11L, 13L), // vs doc 1: exactly 0.5
      6L -> Set(10L, 20L, 21L, 22L),
      7L -> Set(30L, 31L, 32L, 33L, 34L, 35L))
    val direct = pairs(sets, None)
    assert(direct.nonEmpty)
    // budget 1 exercises the 64-pass cap (units > 64 here)
    for (budget <- Seq(1L, 3L, 100L))
      assert(pairs(sets, Some(budget)) === direct, s"diverged at budget $budget")
  }

  test("q42 with batching on == q42 with batching off at sf0.001") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("q42_ngram_jaccard")
    def run(): Seq[String] = q(s, dir).collect().map(_.toString).toSeq
    CacheRegistry.clear(s)
    val off = run()
    CacheRegistry.clear(s) // jaccardPairs memoizer must not serve the unbatched frame
    s.conf.set("graft.textdedup.verifyBatchUnits", "20")
    try {
      val on = run()
      assert(on === off)
    } finally {
      s.conf.unset("graft.textdedup.verifyBatchUnits")
      CacheRegistry.clear(s)
    }
  }
}
