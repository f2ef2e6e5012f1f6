package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Substring/token-level operators: the BPE merge fold's greedy
  * left-to-right semantics, the distributed BPE trainer against the
  * classic hand-computable corpus, and the containment/dup-span queries'
  * structural guarantees on real testdata. */
class SubstringOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mergeOf(word: String, a: String, b: String): Seq[String] =
    Seq(word).toDF("word")
      .select(split(col("word"), "").as("syms"))
      .select(SubstringOps.mergeOnce(col("syms"), a, b).as("m"))
      .head().getSeq[String](0)

  test("mergeOnce replaces adjacent pairs left-to-right, non-overlapping") {
    assert(mergeOf("abab", "a", "b") === Seq("ab", "ab"))
    // overlap: aaa merges the FIRST aa, the remaining a stays single
    assert(mergeOf("aaa", "a", "a") === Seq("aa", "a"))
    assert(mergeOf("aaaa", "a", "a") === Seq("aa", "aa"))
    // no occurrences → identity
    assert(mergeOf("xyz", "a", "b") === Seq("x", "y", "z"))
    // pair at the very start and very end
    assert(mergeOf("abba", "b", "a") === Seq("a", "b", "ba"))
  }

  test("bpeTrain learns the classic corpus's merges in the known order") {
    // Sennrich et al.'s worked example: {low:5, lower:2, newest:6, widest:3}.
    // Hand count: es=9 and st=9 tie → (a,b)-ascending tie-break picks
    // (e,s); then (es,t)=9; then lo=7 / ow=7 tie → (l,o).
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val (merges, vocab) = SubstringOps.bpeTrain(words, numMerges = 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val syms = vocab.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("newest") === Seq("n", "e", "w", "est"))
    assert(syms("widest") === Seq("w", "i", "d", "est"))
    assert(syms("low") === Seq("lo", "w"))
    assert(syms("lower") === Seq("lo", "w", "e", "r"))
  }

  test("bpeTrain stops early when no pairs remain") {
    val words = Seq(("ab", 3L)).toDF("word", "cnt")
    // round 1 merges (a,b); after that every word is a single symbol and
    // the pair table is empty — the loop must stop, not throw
    val (merges, vocab) = SubstringOps.bpeTrain(words, numMerges = 5)
    assert(merges === Seq(("a", "b")))
    assert(vocab.select(col("syms")).head().getSeq[String](0) === Seq("ab"))
  }

  test("q112 containment dominates q42 jaccard on every shared pair") {
    // containment uses min-size as denominator, jaccard the union —
    // c ≥ j always, and every jaccard-flagged pair must appear in the
    // containment result at the same-or-lower threshold
    val jac = graft.SparkEntry.queries("q42_ngram_jaccard")(spark, sf001)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cont = graft.SparkEntry.queries("q112_shingle_containment")(spark, sf001)
      .select(col("doc_a"), col("doc_b"), col("containment")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.nonEmpty)
    jac.foreach { case (pair, j) =>
      assert(cont.contains(pair), s"jaccard pair $pair missing from containment")
      assert(cont(pair) >= j - 1e-9, s"containment below jaccard for $pair")
    }
  }

  test("q108 span report: every row spans >=2 docs and occurrences >= docs") {
    val rows = graft.SparkEntry.queries("q108_dup_ngram_spans")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nOcc) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))
      assert(nDocs >= 2 && nOcc >= nDocs)
      assert(r.getAs[String]("example").split(" ").length === 8)
    }
  }
}
