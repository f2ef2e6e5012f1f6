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

  test("coalesceSpans merges overlapping and touching windows, splits on gaps") {
    // doc 1: positions 1,2,10 — 1&2 overlap; 10 is 8 past 2 (touching:
    // [2,9] and [10,17] are adjacent words) → ONE island [1,17].
    // doc 1: position 20 — gap 10 > 8 from 10 → new island [20,27].
    // doc 2: single position 5 → [5,12].
    val flagged = Seq((1L, 1L), (1L, 2L), (1L, 10L), (1L, 20L), (2L, 5L))
      .toDF("doc_id", "pos")
    val spans = SubstringOps.coalesceSpans(flagged)
      .orderBy(col("doc_id"), col("span_start"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans === Array(
      (1L, 1L, 17L, 17L, 3L),   // three grams coalesced
      (1L, 20L, 27L, 8L, 1L),
      (2L, 5L, 12L, 8L, 1L)))
  }

  test("q141 intervals: maximal (non-mergeable), well-formed, grounded in q108's dup grams") {
    val rows = graft.SparkEntry.queries("q141_dup_span_coalesce")(spark, sf001)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_words"), r.getAs[Long]("n_grams")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, s, e, w, n) =>
      assert(s >= 1 && e >= s && w === e - s + 1 && w >= 8 && n >= 1)
      // an island of n grams spans at most n windows end-to-end-touching
      assert(w <= 8 * n)
    }
    // MAXIMALITY: two spans of the same doc never overlap or touch — they
    // would have been one island
    rows.groupBy(_._1).values.foreach { docSpans =>
      docSpans.sortBy(_._2).toSeq.sliding(2).foreach {
        case Seq((_, _, e1, _, _), (_, s2, _, _, _)) => assert(s2 > e1 + 1)
        case _ => ()
      }
    }
    // every doc with a removal interval holds at least one cross-doc
    // duplicated gram (grounding against the q108 detection statistic)
    val dupDocs = SubstringOps.dupSpanGroups(spark, sf001).count()
    assert(dupDocs > 0 && rows.nonEmpty)
  }

  test("applySpanRemoval cuts exactly the interval words, keeps order") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f")),
      (2L, Seq("x", "y", "z")),
      (3L, Seq("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8", "w9", "w10")),
      (4L, Seq("untouched", "doc"))).toDF("doc_id", "w")
    val intervals = Seq(
      (1L, 2L, 4L),             // cut b,c,d     → residual "a e f"
      (2L, 1L, 3L),             // full cover    → residual ""
      (3L, 1L, 2L), (3L, 5L, 6L) // two islands  → residual "w3 w4 w7 w8 w9 w10"
    ).toDF("doc_id", "span_start", "span_end")
    val out = SubstringOps.applySpanRemoval(docs, intervals)
      .orderBy(col("doc_id")).collect()
    def md5Of(s: String) = Seq(s).toDF("t").select(md5(col("t"))).head().getString(0)
    // doc 4 has no intervals → not rewritten, not emitted
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val byDoc = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(byDoc(1L) === ((6L, 3L, 3L, md5Of("a e f"))))
    assert(byDoc(2L) === ((3L, 3L, 0L, md5Of(""))))
    assert(byDoc(3L) === ((10L, 4L, 6L, md5Of("w3 w4 w7 w8 w9 w10"))))
  }

  test("q151 apply is consistent with q141's intervals on real data") {
    val intervals = graft.SparkEntry.queries("q141_dup_span_coalesce")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val applied = graft.SparkEntry.queries("q151_span_removal_apply")(spark, sf001)
      .collect()
    assert(applied.nonEmpty)
    // one output row per doc holding intervals; removed = interval width
    // sum (disjointness); kept + removed = n_words always
    val widthByDoc = intervals.groupBy(_._1).map { case (d, ivs) =>
      d -> ivs.map { case (_, s, e) => e - s + 1 }.sum }
    assert(applied.map(_.getLong(0)).toSeq === widthByDoc.keys.toSeq.sorted)
    applied.foreach { r =>
      val (doc, n, rem, kept) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rem === widthByDoc(doc), s"doc $doc removed $rem != width sum")
      assert(kept === n - rem, s"doc $doc kept $kept != $n - $rem")
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
