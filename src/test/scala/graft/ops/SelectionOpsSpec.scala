package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.functions.col

/** Selection/training-prep family: each distributed answer is checked
  * against an independent sequential JVM recomputation (q314, q317) or
  * against the published contract derived from sibling query output
  * (q315 from q313's scores, q316's stratified quota). */
class SelectionOpsSpec extends graft.SparkSpec {

  private lazy val docs: Seq[(Long, String, String, String)] =
    graft.schema.Tables.t(spark, sf001, "documents")
      .select("doc_id", "text", "lang", "source").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)

  private def words(text: String): Array[String] =
    text.toLowerCase.trim.split("\\s+", -1)

  test("q314 equals a sequential first-occurrence dedup over the corpus") {
    // sequential reference: walk documents in doc_id order, keep each
    // 8-word segment only on its first appearance anywhere in the corpus
    val seen = mutable.HashSet.empty[String]
    val ref = docs.map { case (id, text, _, _) =>
      val segs = words(text).grouped(SelectionOps.SegW).map(_.mkString(" ")).toSeq
      val kept = segs.filter(seen.add) // add returns false on duplicates
      val clean = kept.mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString
      // empty clean text counts ZERO words (both the Spark branch and the
      // oracle's `clean IS NULL OR clean = ''` guard — ADVICE r14)
      val cw = if (clean.isEmpty) 0L else clean.split(" ", -1).length.toLong
      id -> ((segs.size.toLong, (segs.size - kept.size).toLong, hex, cw))
    }.toMap
    val rows = graft.SparkEntry.queries("q314_paragraph_dedup")(spark, sf001).collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val (n, d, h, w) = ref(r.getLong(0))
      assert(r.getLong(1) === n, s"doc ${r.getLong(0)} n_segs")
      assert(r.getLong(2) === d, s"doc ${r.getLong(0)} n_dup")
      assert(r.getLong(3) === w, s"doc ${r.getLong(0)} clean_words")
      assert(r.getString(4) === h, s"doc ${r.getLong(0)} clean_md5")
    }
    // a corpus with duplicates must actually lose some segments
    assert(rows.map(_.getLong(2)).sum > 0, "no duplicate segments removed")
  }

  test("q314 counts zero clean_words for empty/whitespace-only documents") {
    // The latent ADVICE r14 edge: a corpus-FIRST empty document keeps its
    // (empty) segment, so clean = '' non-NULL — both engines must count 0
    // words for it, not len(split('')) = 1.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q314-empty").toString
    Seq(
      (0L, "", "en", "s0"),          // corpus-first empty segment: kept
      (1L, "   ", "en", "s0"),       // whitespace-only: dup of doc 0's ''
      (2L, "a b c", "en", "s1"),     // normal
      (3L, "a b c", "en", "s1"))     // full dup: clean = '' via empty keep
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q314_paragraph_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val md5empty = "d41d8cd98f00b204e9800998ecf8427e"
    assert(rows(0L) === ((1L, 0L, 0L, md5empty)), "corpus-first empty doc")
    assert(rows(1L) === ((1L, 1L, 0L, md5empty)), "whitespace-only dup doc")
    assert(rows(2L)._3 === 3L && rows(2L)._2 === 0L, "normal doc")
    assert(rows(3L) === ((1L, 1L, 0L, md5empty)), "fully-deduped doc")
  }

  test("q315 chosen/rejected are the q313 score extremes per prompt group") {
    val scores = graft.SparkEntry.queries("q313_hashed_classifier")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val groups = scores.keys.groupBy(_ % 50)
    val rows = graft.SparkEntry.queries("q315_dpo_pairs")(spark, sf001).collect()
    assert(rows.length === groups.size)
    rows.foreach { r =>
      val p = r.getLong(0)
      val ids = groups(p).toSeq
      val best = ids.minBy(id => (-scores(id), id))
      val worst = ids.minBy(id => (scores(id), id))
      assert(r.getLong(2) === best, s"prompt $p chosen")
      assert(r.getLong(4) === worst, s"prompt $p rejected")
      assert(r.getLong(6) === scores(best) - scores(worst), s"prompt $p margin")
      assert(r.getString(7) === (if (r.getLong(6) >= SelectionOps.DpoMargin)
        "keep" else "drop"))
    }
    // the margin gate must be live in both directions at this SF
    assert(rows.exists(_.getString(7) == "keep") &&
      rows.exists(_.getString(7) == "drop"))
  }

  test("q316 keeps exactly the per-source top-quota by (score desc, doc_id)") {
    val rows = graft.SparkEntry.queries("q316_dsir_resample")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(4), r.getString(5)))
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val quota = math.ceil(rs.length / 4.0).toLong
      val sorted = rs.sortBy { case (id, _, score, _, _) => (-score, id) }
      sorted.zipWithIndex.foreach { case ((id, _, _, rk, label), i) =>
        assert(rk === i + 1L, s"$src doc $id rank")
        assert(label === (if (rk <= quota) "keep" else "drop"), s"$src doc $id")
      }
      assert(rs.count(_._5 == "keep") === quota, s"$src quota")
    }
  }

  test("q317 equals a sequential stupid-backoff LM and terciles are ordered") {
    // sequential LM from the src0 slice, with the engine's exact rounding
    // discipline: per-term ln rounded HALF_UP at 9 dp, decimal sum,
    // round-6 logprob and perplexity
    val ref = docs.filter(_._4 == "src0")
    val c1 = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    val c12 = mutable.HashMap.empty[(String, String), Long].withDefaultValue(0L)
    ref.foreach { case (_, text, _, _) =>
      val ws = words(text)
      ws.foreach(w => c1(w) += 1)
      ws.sliding(2).filter(_.length == 2).foreach(p => c12((p(0), p(1))) += 1)
    }
    val n = c1.values.sum; val v = c1.size.toLong
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expect = docs.map { case (id, text, _, _) =>
      val ws = words(text)
      val terms = ws.sliding(2).filter(_.length == 2).map { p =>
        val cb = c12((p(0), p(1)))
        if (cb > 0) r9(math.log(cb.toDouble / c1(p(0))))
        else r9(math.log(0.4 * (c1(p(1)) + 1) / (n + v)))
      }.toSeq
      val ll = terms.sum
      val np = terms.size
      id -> ((np.toLong,
        BigDecimal(ll.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.exp(-ll.toDouble / np))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val rows = graft.SparkEntry.queries("q317_perplexity_buckets")(spark, sf001)
      .collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val (np, ll, ppl) = expect(r.getLong(0))
      assert(r.getLong(2) === np, s"doc ${r.getLong(0)} n_pairs")
      assert(r.getDouble(3) === ll, s"doc ${r.getLong(0)} logprob")
      assert(r.getDouble(4) === ppl, s"doc ${r.getLong(0)} ppl")
    }
    // tercile contract per language: sizes within 1, ppl ranges ordered
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val by = rs.groupBy(_.getString(5)).view.mapValues(_.map(_.getDouble(4)))
      val sizes = Seq("head", "middle", "tail").map(b => by(b).length)
      assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes $sizes")
      assert(by("head").max <= by("middle").min, s"$lang head<=middle")
      assert(by("middle").max <= by("tail").min, s"$lang middle<=tail")
    }
  }

  test("q317 LM guard: shuffle-join fallback is value-identical to broadcast") {
    // VERDICT r14 item 1: above graft.ppl.maxBroadcastRows the LM joins
    // must degrade to shuffle joins, not force an unbounded broadcast.
    // Decimal-quantized terms make the per-doc sum order-independent, so
    // the two paths must agree BIT-exactly.
    def run() = {
      // each run must re-plan from scratch: CacheManager would otherwise
      // serve the previous run's persisted LM/agg frames (same canonical
      // logical plan) and the fallback path would never execute
      CacheRegistry.release(spark, "ppl-")
      graft.SparkEntry.queries("q317_perplexity_buckets")(spark, sf001)
    }
    val base = run().collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("graft.ppl.maxBroadcastRows", "0")
      // Catalyst would re-broadcast the tiny sf0.001 tables on statistics
      // alone — disable auto-broadcast so the fallback path really runs
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fb = run()
      val p = fb.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"guard=0 still planned only broadcast joins:\n$p")
      val rows = fb.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      assert(rows === base, "shuffle-join fallback diverged from broadcast")
      assert(spark.conf.get("graft.ppl.lastC12Rows").toLong > 0L)
    } finally {
      spark.conf.unset("graft.ppl.maxBroadcastRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
    // count-prune: an impossible threshold empties the bigram table and
    // every pair scores through the unigram backoff — still total, still
    // terciled, but a different model (conf-gated, default off)
    try {
      spark.conf.set("graft.ppl.minPairCount", Long.MaxValue.toString)
      val pruned = run().collect()
      assert(spark.conf.get("graft.ppl.lastC12Rows").toLong === 0L)
      assert(pruned.length === base.length)
      val basePpl = base.map(r => r.head.asInstanceOf[Long] -> r(4)).toMap
      assert(pruned.exists(r => basePpl(r.getLong(0)) != r.getDouble(4)),
        "pruning the whole bigram table changed no perplexity")
    } finally {
      spark.conf.unset("graft.ppl.minPairCount")
      CacheRegistry.release(spark, "ppl-")
    }
  }

  test("q323 equals a sequential DoReMi multiplicative-weights round") {
    // sequential reference: the q317 spec's LM discipline (r9-quantized
    // terms, decimal sums) aggregated per SOURCE, then the DoReMi update
    val ref = docs.filter(_._4 == "src0")
    val c1 = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    val c12 = mutable.HashMap.empty[(String, String), Long].withDefaultValue(0L)
    ref.foreach { case (_, text, _, _) =>
      val ws = words(text)
      ws.foreach(w => c1(w) += 1)
      ws.sliding(2).filter(_.length == 2).foreach(p => c12((p(0), p(1))) += 1)
    }
    val n = c1.values.sum; val v = c1.size.toLong
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val perSrc = docs.groupBy(_._4).map { case (src, ds) =>
      var pairs = 0L; var nDocs = 0L; var ll = BigDecimal(0)
      ds.foreach { case (_, text, _, _) =>
        val ws = words(text)
        val terms = ws.sliding(2).filter(_.length == 2).map { p =>
          val cb = c12((p(0), p(1)))
          if (cb > 0) r9(math.log(cb.toDouble / c1(p(0))))
          else r9(math.log(0.4 * (c1(p(1)) + 1) / (n + v)))
        }.toSeq
        if (terms.nonEmpty) { nDocs += 1; pairs += terms.size; ll += terms.sum }
      }
      src -> ((nDocs, pairs, ll))
    }
    val tot = perSrc.values.map(_._2).sum
    val ceOf = perSrc.view.mapValues { case (_, p, ll) => -ll.toDouble / p }.toMap
    val ceRef = ceOf("src0")
    val raw = perSrc.map { case (src, (_, p, _)) =>
      src -> r9((p.toDouble / tot) * math.exp(math.max(0.0, ceOf(src) - ceRef)))
    }
    val z = raw.values.sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.SparkEntry.queries("q323_doremi_reweight")(spark, sf001).collect()
    assert(rows.length === perSrc.size)
    rows.foreach { r =>
      val src = r.getString(0)
      val (nd, p, _) = perSrc(src)
      assert(r.getLong(1) === nd, s"$src n_docs")
      assert(r.getLong(2) === p, s"$src n_pairs")
      assert(r.getDouble(3) === r6(ceOf(src)), s"$src ce")
      assert(r.getDouble(4) === r6(math.max(0.0, ceOf(src) - ceRef)), s"$src excess")
      assert(r.getDouble(5) === r6(p.toDouble / tot), s"$src w0")
      assert(r.getDouble(6) === r6((raw(src) / z).toDouble), s"$src w1")
      assert(r.getLong(7) ===
        BigDecimal(2.0 * tot * (raw(src) / z).toDouble)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, s"$src alloc")
    }
    // the reference slice carries zero excess; some source must be upweighted
    val bySrc = rows.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(bySrc("src0") === 0.0, "reference slice must have zero excess")
    assert(rows.exists(r => r.getDouble(6) > r.getDouble(5)),
      "no source was upweighted — the update is degenerate")
  }

  test("q336 equals a sequential 3-round smoothed MW iteration") {
    // same LM + per-source fold as the q323 test, then three smoothed
    // multiplicative-weights rounds with the engine's quantization: raw
    // r9-quantized BEFORE each normalizer sum, divisions in double
    val ref = docs.filter(_._4 == "src0")
    val c1 = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    val c12 = mutable.HashMap.empty[(String, String), Long].withDefaultValue(0L)
    ref.foreach { case (_, text, _, _) =>
      val ws = words(text)
      ws.foreach(w => c1(w) += 1)
      ws.sliding(2).filter(_.length == 2).foreach(p => c12((p(0), p(1))) += 1)
    }
    val n = c1.values.sum; val v = c1.size.toLong
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val perSrc = docs.groupBy(_._4).map { case (src, ds) =>
      var pairs = 0L; var ll = BigDecimal(0)
      ds.foreach { case (_, text, _, _) =>
        val ws = words(text)
        val terms = ws.sliding(2).filter(_.length == 2).map { p =>
          val cb = c12((p(0), p(1)))
          if (cb > 0) r9(math.log(cb.toDouble / c1(p(0))))
          else r9(math.log(0.4 * (c1(p(1)) + 1) / (n + v)))
        }.toSeq
        if (terms.nonEmpty) { pairs += terms.size; ll += terms.sum }
      }
      src -> ((pairs, ll))
    }
    val tot = perSrc.values.map(_._1).sum
    val k = perSrc.size
    val ceRef = -perSrc("src0")._2.toDouble / perSrc("src0")._1
    val excess = perSrc.view.mapValues { case (p, ll) =>
      math.max(0.0, -ll.toDouble / p - ceRef) }.toMap
    var w: Map[String, BigDecimal] =
      perSrc.view.mapValues { case (p, _) => r9(p.toDouble / tot) }.toMap
    val hist = (1 to 3).map { _ =>
      val raw = w.map { case (s, wv) => s -> r9(wv.toDouble * math.exp(excess(s))) }
      val z = raw.values.sum
      w = raw.map { case (s, rv) =>
        s -> r9(0.99 * rv.toDouble / z.toDouble + 0.01 / k) }
      w
    }
    val rows = graft.SparkEntry.queries("q336_doremi_iterate")(spark, sf001).collect()
    assert(rows.length === k)
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getDouble(1) === r6(excess(src)), s"$src excess")
      assert(r.getDouble(2) === r6(perSrc(src)._1.toDouble / tot), s"$src w0")
      (0 until 3).foreach { i =>
        assert(r.getDouble(3 + i) === r6(hist(i)(src).toDouble), s"$src w${i + 1}")
      }
      val wbar = (hist(0)(src) + hist(1)(src) + hist(2)(src)).toDouble / 3
      assert(r.getDouble(6) === r6(wbar), s"$src wbar")
      assert(r.getLong(7) === BigDecimal(2.0 * tot * wbar)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, s"$src alloc")
    }
    // each round's weights are a distribution (up to the 9dp quanta)
    hist.foreach(h => assert(math.abs(h.values.sum.toDouble - 1.0) < 1e-6))
  }

  test("q338 equals a sequential two-phase annealing plan") {
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rnd(x: Double) = BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    def score(ws: Array[String]): Long = ws.sliding(2).filter(_.length == 2).map { p =>
      val d = md.digest(p.mkString(" ").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h1 = 0L
      (0 until 7).foreach(i => h1 = (h1 << 8) | (d(i) & 0xffL))
      ((h1 % ClassifierOps.Buckets) * 2654435761L) % 1001L - 500L
    }.sum
    // per-source fold over docs that produce >= 1 bigram (the q313 frame)
    val per = docs.groupBy(_._4).map { case (src, ds) =>
      var n = 0L; var toks = 0L; var q = 0L
      ds.foreach { case (_, text, _, _) =>
        val ws = words(text).toArray
        if (ws.length >= 2) { n += 1; toks += ws.length; q += score(ws) }
      }
      src -> ((n, toks, q))
    }
    val tot = per.values.map(_._2).sum
    val qbarAll = per.values.map(_._3).sum.toDouble / per.values.map(_._1).sum
    val raw = per.view.mapValues { case (_, t0, _) => r9(math.sqrt(t0.toDouble)) }.toMap
    val zm = raw.values.sum
    val elite = per.view.mapValues { case (n, _, q) => q.toDouble / n > qbarAll }.toMap
    val za = raw.filter { case (s0, _) => elite(s0) }.values.sum
    assert(elite.values.exists(identity) && elite.values.exists(!_),
      "corpus should split into elite and non-elite sources")
    val rows = graft.SparkEntry.queries("q338_anneal_schedule")(spark, sf001).collect()
    assert(rows.length === per.size)
    rows.foreach { r =>
      val src = r.getString(0)
      val (n, t0, q) = per(src)
      assert(r.getLong(1) === n, s"$src n_docs")
      assert(r.getLong(2) === t0, s"$src toks")
      assert(r.getDouble(3) === r6(q.toDouble / n), s"$src qbar")
      assert(r.getBoolean(4) === elite(src), s"$src elite")
      val main = rnd(1.8 * tot * raw(src).toDouble / zm.toDouble)
      val ann = if (elite(src)) rnd(0.2 * tot * raw(src).toDouble / za.toDouble) else 0L
      assert(r.getLong(5) === main, s"$src main_alloc")
      assert(r.getLong(6) === ann, s"$src anneal_alloc")
      assert(r.getLong(7) === main + ann, s"$src total_alloc")
      assert(r.getDouble(8) === r6((main + ann) * 1.0 / t0), s"$src epochs")
      assert(r.getLong(9) === math.min(main + ann, 4 * t0), s"$src final_alloc")
      assert(r.getLong(10) === main + ann - math.min(main + ann, 4 * t0), s"$src shortfall")
    }
    // budget accounting: each phase lands within rounding of its share
    val mains = rows.map(_.getLong(5)).sum
    val anns = rows.map(_.getLong(6)).sum
    assert(math.abs(mains - 1.8 * tot) <= rows.length, "main phase budget drift")
    assert(math.abs(anns - 0.2 * tot) <= rows.length, "anneal phase budget drift")
    // the anneal phase concentrates: only elite sources receive it
    rows.foreach(r => assert((r.getLong(6) > 0) === r.getBoolean(4)))
  }

  test("doremiUntil converges to the smoothed recurrence's fixed point") {
    val s = spark
    import s.implicits._
    val w0 = Seq(("a", 0.0, BigDecimal(0.4)), ("b", 0.2, BigDecimal(0.35)),
      ("c", 0.5, BigDecimal(0.25)))
      .toDF("source", "excess", "w")
      .withColumn("w", col("w").cast("decimal(18,9)"))
    val (fixed, rounds) = graft.ops.SelectionOps.doremiUntil(w0,
      tol = 1e-9, maxRounds = 200)
    assert(rounds < 200, s"did not converge in $rounds rounds")
    // one MORE round moves at most one 9dp quantum per source: the
    // DECIMAL(18,9) quantization means the recurrence's fixed point is
    // exact only up to the quantum (a 1e-9 limit cycle is the quantized
    // image of the continuous fixed point) — compare as decimals so
    // double representation noise can't flake the bound
    val again = graft.ops.SelectionOps.doremiRound(fixed)
      .select(col("source"), col("w").as("wn"))
      .join(fixed.select(col("source"), col("w").as("wp")), Seq("source"))
      .collect()
    again.foreach { r =>
      val d = (BigDecimal(r.getDecimal(1)) - BigDecimal(r.getDecimal(2))).abs
      assert(d <= BigDecimal("1e-9"), s"${r.getString(0)} still moving by $d")
    }
    val ws = fixed.collect().map(r => r.getString(0) ->
      r.getDecimal(r.fieldIndex("w")).doubleValue).toMap
    // distribution, smoothing floor honoured, mass ordered by excess
    assert(math.abs(ws.values.sum - 1.0) < 1e-6)
    ws.values.foreach(v => assert(v >= 0.01 / 3 - 1e-9))
    assert(ws("c") > ws("b") && ws("b") > ws("a"),
      s"fixed point does not order by excess: $ws")
  }

  test("q318 equals a sequential span-union Gopher repetition pass") {
    def ref(text: String): (Long, Double, Double) = {
      val ws = words(text)
      val starts = ws.scanLeft(0L)((acc, w) => acc + w.length + 1)
      val total = ws.map(_.length.toLong).sum + ws.length - 1
      val grams = (0 until ws.length - 1).map { i =>
        (ws(i) + " " + ws(i + 1), starts(i), ws(i).length + ws(i + 1).length + 1L)
      }
      val counts = grams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val (tc, tg) = grams.map(g => (counts(g._1), g._3)).max
      val dupSpans = grams.filter(g => counts(g._1) >= 2)
        .map(g => (g._2, g._2 + g._3)).sortBy(_._1)
      var covered = 0L; var maxEnd = 0L
      dupSpans.foreach { case (s0, e0) =>
        covered += math.max(0L, e0 - math.max(s0, maxEnd))
        maxEnd = math.max(maxEnd, e0)
      }
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (total, r6(tc * tg * 1.0 / total), r6(covered * 1.0 / total))
    }
    val rows = graft.SparkEntry.queries("q318_gopher_repetition")(spark, sf001)
      .collect()
    assert(rows.length === docs.size)
    val byId = docs.map(d => d._1 -> d._2).toMap
    rows.foreach { r =>
      val (total, tf, df) = ref(byId(r.getLong(0)))
      assert(r.getLong(1) === total, s"doc ${r.getLong(0)} n_chars")
      assert(r.getDouble(2) === tf, s"doc ${r.getLong(0)} top_frac")
      assert(r.getDouble(3) === df, s"doc ${r.getLong(0)} dup_frac")
      assert(r.getString(4) === (if (tf > 0.2 || df > 0.2) "drop" else "keep"))
    }
    assert(rows.exists(_.getString(4) == "drop") &&
      rows.exists(_.getString(4) == "keep"), "threshold not live at this SF")
  }

  test("q319 equals a sequential corpus-wide exact-substring prune") {
    val G = 6
    // global first-occurrence map over overlapping G-grams, corpus order
    val occ = mutable.HashMap.empty[String, mutable.ArrayBuffer[(Long, Int)]]
    docs.foreach { case (id, text, _, _) =>
      val ws = words(text)
      (0 to ws.length - G).foreach { i =>
        occ.getOrElseUpdate(ws.slice(i, i + G).mkString(" "),
          mutable.ArrayBuffer.empty) += ((id, i))
      }
    }
    val removedStarts = occ.values.filter(_.size >= 2)
      .flatMap(v => v.sorted.drop(1)).toSet
    val expect = docs.map { case (id, text, _, _) =>
      val ws = words(text)
      val coveredIdx = (0 to ws.length - G)
        .filter(i => removedStarts.contains((id, i)))
        .flatMap(i => i until i + G).toSet
      val kept = ws.zipWithIndex.collect {
        case (w, i) if !coveredIdx.contains(i) => w }
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> ((ws.length.toLong, (ws.length - kept.length).toLong, hex))
    }.toMap
    val rows = graft.SparkEntry.queries("q319_exact_substring_prune")(spark, sf001)
      .collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val (nw, rm, hex) = expect(r.getLong(0))
      assert(r.getLong(1) === nw, s"doc ${r.getLong(0)} n_words")
      assert(r.getLong(2) === rm, s"doc ${r.getLong(0)} removed_words")
      assert(r.getString(4) === hex, s"doc ${r.getLong(0)} kept_md5")
    }
    assert(rows.map(_.getLong(2)).sum > 0, "no duplicate spans pruned")
  }

  test("q320 composes q314's dedup with the LM terciles consistently") {
    val langOf = docs.map(d => d._1 -> d._3).toMap
    // q314's oracle-verified output is the independent source of cleaned
    // sizes: a doc is scoreable iff its cleaned text has >= 2 words
    val clean = graft.SparkEntry.queries("q314_paragraph_dedup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val scoreable = clean.filter(_._2 >= 2)
    val wordsByLang = scoreable.groupBy(kv => langOf(kv._1))
      .view.mapValues(_.values.sum).toMap
    val docsByLang = scoreable.groupBy(kv => langOf(kv._1))
      .view.mapValues(_.size.toLong).toMap
    val rows = graft.SparkEntry.queries("q320_ccnet_pipeline")(spark, sf001)
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(2)).sum === docsByLang(lang), s"$lang doc count")
      assert(rs.map(_.getLong(3)).sum === wordsByLang(lang), s"$lang tokens")
      val sizes = rs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes $sizes")
      rs.foreach(r => assert(r.getString(4) ===
        (if (r.getString(1) == "tail") "drop" else "keep")))
    }
  }

  test("q321 equals a sequential budget/epoch plan from raw token counts") {
    val toks = docs.groupBy(_._4).view
      .mapValues(_.map(d => words(d._2).length.toLong).sum).toMap
    val z = toks.values.map(t => math.sqrt(t.toDouble)).sum
    val budget = 2L * toks.values.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.SparkEntry.queries("q321_token_budget")(spark, sf001)
      .collect()
    assert(rows.length === toks.size)
    rows.foreach { r =>
      val src = r.getString(0); val t0 = toks(src)
      val wt = math.sqrt(t0.toDouble) / z
      val alloc = BigDecimal(budget * wt)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(r.getLong(1) === t0, s"$src tokens")
      assert(r.getDouble(2) === r6(wt), s"$src weight")
      assert(r.getLong(3) === alloc, s"$src alloc")
      assert(r.getDouble(4) === r6(alloc * 1.0 / t0), s"$src epochs")
      assert(r.getLong(5) === math.min(alloc, 4 * t0), s"$src final_alloc")
      assert(r.getLong(6) === alloc - math.min(alloc, 4 * t0), s"$src shortfall")
    }
  }
}
