package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale validation of the dedup family (SCALE.md "Measured"
  * section): the 100 TB claims are plan-shape-proven at 17 MB; this main
  * measures them at ~1 GB on a DETERMINISTIC synthetic corpus with
  *  - planted near-dup families: docs with id % 100 ∈ {1,2,3} are ~2%-
  *    perturbed copies of their block head (J ≈ 0.85 vs base) and docs
  *    with id % 100 ∈ {4,5} are ~10%-perturbed WEAK copies (J ≈ 0.45–0.6
  *    — straddling the 0.5 near-dup threshold, the regime where LSH band
  *    count decides recall); families are linear in corpus size by
  *    construction;
  *  - a planted boilerplate hot key: 1% of docs share a fixed 22-word
  *    header, so each header shingle's doc frequency grows with the
  *    corpus and contributes O(n²/10⁴) candidate pairs UNCAPPED — the
  *    exact skew pathology `graft.textdedup.maxShingleDf` exists to cut.
  *
  * It runs the REAL query code (SparkEntry.queries) against the generated
  * directory at two corpus sizes, cap off and cap on, and prints one
  * machine-grepped line per phase: wall seconds, output rows, input
  * docs/sec, and shuffle-write MB (task-metrics listener). Linear vs
  * quadratic growth is read off the candidate-pair counts between sizes.
  *
  * Everything is derived from xxhash64/md5 of literal strings — no RNG, no
  * clock — so reruns and re-generations are byte-stable.
  */
object ScaleBench {

  /** 22 words → 20 boilerplate 3-shingles per header-carrying doc. */
  private val Boiler: String =
    (0 until 22).map(i => s"boiler$i").mkString(" ")

  // pert_mod: 50 → ~2% perturbed words (strong copies, 3-shingle Jaccard
  // vs base ≈ 0.85); 10 → ~10% (weak copies, J ≈ 0.45–0.6 — the straddle-
  // the-0.5-threshold regime where LSH band count decides recall);
  // 0 → not a copy
  private val DocBodyExpr: String =
    """concat_ws(' ', transform(sequence(0, n_words - 1), k ->
      |  CASE WHEN pert_mod > 0 AND pmod(xxhash64(concat('pert:', CAST(id AS STRING), ':', CAST(k AS STRING))), pert_mod) = 0
      |    THEN concat('p', CAST(pmod(xxhash64(concat('pw:', CAST(id AS STRING), ':', CAST(k AS STRING))), 50000) AS STRING))
      |    ELSE concat('w', CAST(pmod(xxhash64(concat('bw:', CAST(base_id AS STRING), ':', CAST(k AS STRING))), 50000) AS STRING))
      |  END))""".stripMargin

  /** Document-corpus formula version: bumped (together with the expression
    * hash below) whenever the generator changes, so a stale
    * previously-generated corpus can never be silently measured against
    * new code — same guard the embeddings generator carries. */
  private val DocVersion = "v2" // v2: weak-copy family at blockpos 4–5

  private def gen(s: SparkSession, n: Long, dir: String): Unit = {
    // reuse only a COMPLETE, CURRENT previous generation: a crashed run
    // leaves the directory without _SUCCESS, and an old formula leaves a
    // mismatched version marker — measuring against either would silently
    // corrupt every growth ratio
    val out = new java.io.File(s"$dir/documents.parquet/_SUCCESS")
    val marker = java.nio.file.Paths.get(s"$dir/documents.version")
    val current = s"$DocVersion:${(Boiler + DocBodyExpr).hashCode}"
    if (out.exists() && java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == current) return
    val df = s.range(0, n, 1, 64).toDF("id")
      .withColumn("blockpos", pmod(col("id"), lit(100L)))
      .withColumn("is_copy", col("blockpos").between(1, 5))
      .withColumn("pert_mod",
        when(col("blockpos").between(1, 3), lit(50L))
          .when(col("blockpos").between(4, 5), lit(10L))
          .otherwise(lit(0L)))
      .withColumn("base_id",
        when(col("is_copy"), col("id") - col("blockpos")).otherwise(col("id")))
      .withColumn("n_words",
        (lit(400) + pmod(xxhash64(concat(lit("len:"), col("base_id"))), lit(400L))).cast("int"))
      // word k of a copy matches its base except at ~2% (strong) / ~10%
      // (weak) of positions, independent per copy — strong copy↔copy
      // Jaccard ≈ 0.8, weak↔base ≈ 0.45–0.6; vocabulary 50k keeps
      // accidental 3-shingle collisions across unrelated docs at ~0
      .withColumn("body", expr(DocBodyExpr))
      .withColumn("text",
        when(col("blockpos") === 50, concat(lit(Boiler + " "), col("body")))
          .otherwise(col("body")))
      .select(col("id").as("doc_id"),
        concat(lit("s"), pmod(col("id"), lit(10L))).as("source"),
        col("text"), length(col("text")).cast("long").as("n_chars"))
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.write(marker, current.getBytes("UTF-8"))
  }

  /** Embedding-corpus formula version: bumped whenever a generator
    * expression changes, so a stale previously-generated corpus can never
    * be silently measured against new code. */
  private val EmbVersion = "v1"

  /** Planted-cluster embedding corpus for the ANN family: 20 well-
    * separated cluster centers (one per label), each vector = its center
    * plus bounded per-component noise — so the TRUE neighbor structure is
    * known by construction and recall of the approximate paths is
    * measurable, not guessed. Same schema as the driver's table
    * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT). */
  private val ClusteredEmbExpr =
    """transform(sequence(0, 63), j -> CAST(
      |  (pmod(xxhash64(concat('c:', CAST(label AS STRING), ':', CAST(j AS STRING))), 2001) / 1000.0 - 1.0)
      |  + (pmod(xxhash64(concat('n:', CAST(id AS STRING), ':', CAST(j AS STRING))), 401) / 1000.0 - 0.2)
      |AS FLOAT))""".stripMargin

  /** Adversarial twin: pure per-component noise, no cluster structure at
    * all — the worst case for any coarse quantizer. Labels exist (schema
    * parity) but carry no geometry. */
  private val UniformEmbExpr =
    """transform(sequence(0, 63), j -> CAST(
      |  pmod(xxhash64(concat('u:', CAST(id AS STRING), ':', CAST(j AS STRING))), 2001) / 1000.0 - 1.0
      |AS FLOAT))""".stripMargin

  // noise (±0.8/dim) comparable to the centroid spread (±1.0/dim).
  // MEASURED finding: still nprobe-flat — in 64 dims squared distances
  // concentrate (pair std ≈ 12% of the mean), so same-label pairs
  // (E[d²] ≈ 27) stay strictly below cross-label ones (≈ 70) and the
  // home list keeps the whole true top-10
  private val OverlapEmbExpr =
    """transform(sequence(0, 63), j -> CAST(
      |  (pmod(xxhash64(concat('c:', CAST(label AS STRING), ':', CAST(j AS STRING))), 2001) / 1000.0 - 1.0)
      |  + (pmod(xxhash64(concat('n:', CAST(id AS STRING), ':', CAST(j AS STRING))), 1601) / 1000.0 - 0.8)
      |AS FLOAT))""".stripMargin

  // the regime where nprobe IS the recall knob: centroid spread (±0.3)
  // far below noise (±0.8), so cross-label E[d²] (≈ 31) sits inside the
  // same-label distribution (≈ 27 ± 3) — true neighbors genuinely
  // straddle lists and each probed list adds recall
  private val MixedEmbExpr =
    """transform(sequence(0, 63), j -> CAST(
      |  (pmod(xxhash64(concat('c:', CAST(label AS STRING), ':', CAST(j AS STRING))), 601) / 1000.0 - 0.3)
      |  + (pmod(xxhash64(concat('n:', CAST(id AS STRING), ':', CAST(j AS STRING))), 1601) / 1000.0 - 0.8)
      |AS FLOAT))""".stripMargin

  private def genEmbeddings(s: SparkSession, n: Long, dir: String, embExpr: String): Unit = {
    val success = new java.io.File(s"$dir/embeddings.parquet/_SUCCESS")
    val marker = java.nio.file.Paths.get(s"$dir/embeddings.version")
    val current = s"$EmbVersion:${embExpr.hashCode}"
    val upToDate = success.exists() &&
      java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == current
    if (upToDate) return
    s.range(0, n, 1, 32).toDF("id")
      .withColumn("label", pmod(col("id"), lit(20L)).cast("int"))
      .withColumn("embedding", expr(embExpr))
      .select(col("id").as("vec_id"), col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    java.nio.file.Files.write(marker, current.getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val sizes: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(100000L, 200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scaletest")
    val spark = SessionDefaults.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val inputBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
        }
    })
    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    def phase(name: String, docs: Long)(body: => Long): Unit = {
      val w0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus by quiescence: task-end events landing
      // after a fixed sleep would be mis-attributed to the NEXT phase
      var prev = -1L
      var stable = 0
      val deadline = System.currentTimeMillis() + 10000
      while (stable < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        val cur = shuffleBytes.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      val drained = stable >= 3 // deadline hit ⇒ bytes may leak into the next phase
      val mb = (shuffleBytes.get() - w0) / 1e6
      println(s"""SCALE {"phase":"$name","docs":$docs,"wall_s":${f(wall)},""" +
        s""""rows_out":$rows,"docs_per_s":${f(docs / wall)},"shuffle_mb":${f(mb)},""" +
        s""""drained":$drained}""")
    }

    // ---- image near-dup phases (q142/q143), shared by "all" and the
    // "image" one-family rerun. What the numbers mean on THIS corpus: the
    // generator's synthetic words are digit-based ("w12345"), so the
    // [a-z ] sanitize collapses every doc to near-identical letter
    // streams and the dHash space degenerates to a few hundred distinct
    // values — the adversarial exact-dup-flood regime. That makes the
    // distinct-hash collapse the load-bearing mitigation: the numbers to
    // read are |distinct hashes| ≪ docs (the collapse), the HASH-pair
    // candidate count (the band join's actual work — expanded doc pairs
    // are answer size, true d=0 dups), and capOFF vs capON growth.
    def imagePhases(dir: String, n: Long): Unit = {
      phase("q142_dhash_build", n) {
        ops.ImageOps.dhashFrame(spark, dir).count()
      }
      // a deterministic 1/10 slice keeps the degenerate corpus's expanded
      // pair count (true dup pairs, quadratic BY SEMANTICS here) sane
      val imgN = n / 10
      val imgHashes = ops.ImageOps.dhashFrame(spark, dir)
        .filter(col("doc_id") < imgN).localCheckpoint()
      phase("q143_img_distinct_hashes", imgN) {
        imgHashes.select(col("dhash_hi"), col("dhash_lo")).distinct().count()
      }
      phase("q143_img_hashcands_capOFF", imgN) {
        ops.ImageOps.hashCandidates(imgHashes).count()
      }
      phase("q143_img_hashcands_capON", imgN) {
        ops.ImageOps.hashCandidates(imgHashes, maxBandDf = 20L).count()
      }
      phase("q143_img_pairs_capOFF", imgN) {
        ops.ImageOps.neardupPairs(imgHashes).count()
      }
      ops.CacheRegistry.release(spark, "q142-dhash:")
      // ---- 128-bit twin (q148/q149): the hash-width vs band-selectivity
      // trade measured head-to-head on the same slice. Twice the bits ⇒
      // more distinct hashes (fewer docs collapse to one value) but each
      // of the 16 bands is still an 8-bit key, so a band bucket's df — and
      // with it the candidate count — should DROP relative to the 64-bit
      // run on this degenerate corpus. Read q148_dhash128_distinct vs
      // q143_img_distinct_hashes and the two hashcands rows.
      val img128 = ops.ImageOps.dhash128Frame(spark, dir)
        .filter(col("doc_id") < imgN).localCheckpoint()
      phase("q148_dhash128_build", n) {
        ops.ImageOps.dhash128Frame(spark, dir).count()
      }
      phase("q148_dhash128_distinct", imgN) {
        img128.select(col("h0"), col("h1"), col("h2"), col("h3")).distinct().count()
      }
      phase("q149_img128_hashcands_capOFF", imgN) {
        ops.ImageOps.hashCandidates128(img128).count()
      }
      phase("q149_img128_hashcands_capON", imgN) {
        ops.ImageOps.hashCandidates128(img128, maxBandDf = 20L).count()
      }
      phase("q149_img128_pairs_capOFF", imgN) {
        ops.ImageOps.neardupPairs128(img128).count()
      }
      ops.CacheRegistry.release(spark, "q148-dhash128:")
    }

    // SPARK_GRAFT_SCALE_PHASES=postloop skips the main corpus loop (the
    // doc/ANN phases take ~20 min) and runs only the post-loop phases —
    // semantic dedup, kNN graph, PageRank, power iteration, count-min —
    // against an already-generated corpus, so a one-phase fix doesn't
    // repay the whole generation. ("semdedup" is the legacy alias from
    // when semantic dedup was the only post-loop phase; same scope.)
    // "image" / "spans" rerun ONLY that family (corpus gen is cached).
    val phaseSel = sys.env.getOrElse("SPARK_GRAFT_SCALE_PHASES", "all")
    // the error message derives from the Set itself so adding a phase
    // can't leave the message stale again (ADVICE r12: 'nprobe' was
    // accepted but missing from the hand-written list)
    val knownPhases = Set("all", "postloop", "semdedup", "image", "spans",
      "events", "cc", "contam", "triangles", "minhash", "funnel", "pq", "nprobe",
      "codec", "selection", "bloom", "mining", "layout", "semdecon")
    require(knownPhases.contains(phaseSel),
      s"SPARK_GRAFT_SCALE_PHASES must be one of ${knownPhases.toSeq.sorted.mkString("'", "', '", "'")}," +
        s" got '$phaseSel' (a typo would silently skip corpus generation)")
    // ---- q276 triangles: the degree-orientation wedge bound ----
    // A synthetic SKEWED graph (one hub adjacent to 5% of nodes over a
    // 3-edges/node random background) makes the counterfactual concrete:
    // an unoriented wedge join generates Σ deg(deg−1)/2 candidates —
    // dominated by the hub's deg² — while the degree-oriented join's
    // candidates are bounded by Σ outdeg² with outdeg ≤ O(√m). The phase
    // reports both counts (the naive one computed arithmetically, not
    // run) and the end-to-end oriented triangle wall.
    // ---- q299–q302 codec seams: per-doc synth+demux maps with NO cross-
    // doc state — the table to pin is docs/s flat across sizes (linear
    // scaling) and shuffle ≈ the narrow audit rows only (a handful of
    // integers per doc; the final ORDER BY is the only exchange).
    // ---- q342/q343 semantic decontamination: fixed benchmark, growing
    // corpus. The production regime: the eval side is a CONSTANT-size
    // broadcast (here the first 500 clustered vectors) while the train
    // side doubles — the table to pin is docs/s FLAT across sizes (each
    // row pays |eval|·d FMA map-side, no corpus shuffle; the only
    // exchange is the struct-max partial combine's one narrow row per
    // vec). rows_out grows with the corpus on the clustered generator
    // (every cluster near an eval cluster keeps flagging) — the cost
    // column is the claim, not the flag count.
    if (phaseSel == "semdecon") {
      sizes.foreach { n =>
        val dir = s"$root/n$n"
        genEmbeddings(spark, n, dir, ClusteredEmbExpr)
        val emb = schema.Tables.t(spark, dir, "embeddings")
        val ev = emb.filter(col("vec_id") < 500)
          .select(col("vec_id").as("eval_id"), col("embedding").as("ee"),
            col("label").as("eval_label"))
        val train = emb.filter(col("vec_id") >= 500)
        phase("semdecon_screen", n) {
          ops.Governance.semanticScreenFor(train, ev)
            .filter(col("m.c") >= 0.35).count()
        }
      }
      spark.stop(); return
    }
    if (phaseSel == "codec") {
      sizes.foreach { n =>
        val dir = s"$root/n$n"
        gen(spark, n, dir)
        Seq("q299_mp3_frames", "q300_h264_demux", "q301_mp3_trim",
          "q302_h264_gop_cut", "q303_warc_records", "q304_html_extract",
          "q305_pdf_extract", "q306_crawl_pipeline", "q307_charset_sniff",
          "q308_mojibake_repair", "q309_url_canonicalize",
          "q310_robots_filter").foreach { q =>
          // .rdd.count(), NOT .count(): a count aggregate lets
          // EliminateSorts remove the final ORDER BY — the query's only
          // exchange — and the phase would measure a plan with no shuffle
          // to measure. Converting to an RDD executes the ordered plan
          // the verify path actually runs.
          phase(q, n) { SparkEntry.queries(q)(spark, dir).rdd.count() }
        }
      }
      spark.stop(); return
    }
    // ---- q314–q321 selection/training-prep family ----
    // The table to pin: q314's and q319's exchanges all move bounded-width
    // rows (two hash longs + a (doc_id, position) pair per SEGMENT/window —
    // never the text), so their shuffle must grow linearly in segments;
    // q315/q316 are partial hash aggregates (shuffle ≈ one narrow row per
    // doc); q318 is doc-local (zero exchange beyond the presentation
    // sort); q317's LM tables broadcast under the graft.ppl guard, so its
    // shuffle is the doc-level aggregate plus the tercile stitch's
    // bounded-key exchange. docs/s flat across sizes = linear scaling.
    // q317 runs through the factored body (the generated corpus has no
    // lang column and its reference slice is source s0); q320/q321 are
    // compositions of the same stages and are covered by the sf bench.
    if (phaseSel == "selection") {
      // optional comma-separated prefix filter for targeted re-measures
      // (a single query's ladder without paying the whole family)
      val only = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
        .map(_.split(",").toSeq).getOrElse(Seq.empty)
      def want(q: String) = only.isEmpty || only.exists(q.startsWith)
      sizes.foreach { n =>
        val dir = s"$root/n$n"
        gen(spark, n, dir)
        Seq("q314_paragraph_dedup", "q315_dpo_pairs", "q316_dsir_resample",
          "q318_gopher_repetition", "q319_exact_substring_prune")
          .filter(want)
          .foreach { q =>
            phase(q, n) { SparkEntry.queries(q)(spark, dir).rdd.count() }
          }
        if (!want("q317_perplexity_buckets")) ()
        else {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("lang", col("source"))
        // default posture: unpruned LM, broadcast only below the
        // graft.ppl.maxBroadcastRows guard (shuffle-join fallback above)
        phase("q317_perplexity_buckets", n) {
          ops.SelectionOps.perplexityBuckets(docs, "s0").rdd.count()
        }
        val c12 = spark.conf.get("graft.ppl.lastC12Rows").toLong
        val c1 = spark.conf.get("graft.ppl.lastC1Rows").toLong
        val guard = spark.conf.getOption("graft.ppl.maxBroadcastRows")
          .map(_.toLong).getOrElse(10000000L)
        println(s"[lmguard] n=$n unpruned c12=$c12 c1=$c1 guard=$guard " +
          s"mode=${if (c12 <= guard) "broadcast" else "shuffle-join"}")
        // production posture: count-pruned LM (c >= 2 — hapax bigrams ride
        // the backoff path), which must land BELOW the broadcast guard
        spark.conf.set("graft.ppl.minPairCount", "2")
        ops.CacheRegistry.release(spark, "ppl-")
        phase("q317_ppl_pruned_lm", n) {
          ops.SelectionOps.perplexityBuckets(docs, "s0").rdd.count()
        }
        val c12p = spark.conf.get("graft.ppl.lastC12Rows").toLong
        println(s"[lmguard] n=$n pruned(c>=2) c12=$c12p guard=$guard " +
          s"mode=${if (c12p <= guard) "broadcast" else "shuffle-join"}")
        spark.conf.unset("graft.ppl.minPairCount")
        ops.CacheRegistry.release(spark, "ppl-")
        }
      }
      spark.stop(); return
    }
    // ---- q325 bloom decontamination: FP-rate vs filter size ladder ----
    // The sizing evidence behind the q325 scaladoc's m ≈ −k·n/ln(1−fp^
    // (1/k)) claim: at each corpus size, the exact broadcast screen
    // (q79 shape) is the baseline, then the bloom probe at m = 2^16/
    // 2^20/2^24 with the measured flagged/true/FP counts printed per
    // rung. What the table must show at 100 TB scale-up: probe wall
    // flat in m (the probe is arithmetic either way), FP count falling
    // ~16× per 16× m (the exponent-k regime), and the m=2^24 rung
    // (2 MB packed) already exact-equivalent on corpora this size —
    // the screen's cost is a CONSTANT-size broadcast while the exact
    // join's build side grows with every benchmark added.
    if (phaseSel == "bloom") {
      import ops.BloomOps
      sizes.foreach { n =>
        val dir = s"$root/n$n"
        gen(spark, n, dir)
        // persisted AND materialized before any phase so the exact
        // baseline and every m rung probe the SAME resident hash frame —
        // otherwise whichever phase runs first eats the one-time
        // shingling cost and the comparison is attribution, not engine
        val sh = ops.TextDedup.shingleRowsFor(
          spark.read.parquet(s"$dir/documents.parquet")).persist()
        sh.count()
        val bench = sh.filter(col("doc_id") % 50 === 0)
          .select(col("h1"), col("h2")).distinct()
        val train = sh.filter(col("doc_id") % 50 =!= 0)
        val benchH = bench.select(col("h1")).distinct()
          .withColumn("bhit", lit(1))
        phase("q79_exact_screen", n) {
          train.join(broadcast(benchH), Seq("h1")).rdd.count()
        }
        Seq(16, 20, 24).foreach { bits =>
          val m = 1 << bits
          val words = BloomOps.buildWords(bench, m)
          phase(s"bloom_probe_m2e$bits", n) {
            BloomOps.screen(train, words, m).filter(col("flagged")).rdd.count()
          }
          if (bits >= 24) {
            // the broadcast carrier's regime (see BloomOps.screen note):
            // same bitset, same arithmetic, torrent-shipped once per
            // executor instead of per task's plan
            phase(s"bloom_probe_m2e${bits}_bcast", n) {
              BloomOps.screenBroadcast(train, words, m)
                .filter(col("flagged")).rdd.count()
            }
          }
          val r = BloomOps.screen(train, words, m)
            .join(broadcast(benchH), Seq("h1"), "left")
            .agg(
              sum(when(col("flagged"), 1L).otherwise(0L)).as("flagged"),
              sum(when(col("bhit").isNotNull, 1L).otherwise(0L)).as("truth"),
              sum(when(col("flagged") && col("bhit").isNull, 1L).otherwise(0L)).as("fp"),
              count(lit(1)).as("probes")).head()
          println(s"[bloom] n=$n m=2^$bits words_kb=${m / 8192} " +
            s"flagged=${r.getLong(0)} true=${r.getLong(1)} fp=${r.getLong(2)} " +
            s"probes=${r.getLong(3)} fp_rate=${f(r.getLong(2).toDouble / r.getLong(3))}")
        }
        sh.unpersist()
      }
      spark.stop(); return
    }
    // ---- q334 bitext mining: exact-quadratic vs IVF-blocked ladder ----
    // The q334 scaladoc's scale claim measured: the exact all-pairs frame
    // is (nv/2)² candidates (must grow 4× per doubling — the rejected
    // form at scale), while blocking both pools to k = nv/100 IVF cells
    // keeps expected cell population constant so candidates grow ~2×.
    // Recall is the fraction of the exact form's MUTUAL pairs the
    // blocked form recovers — on the clustered corpus blocking should
    // recover nearly all of them (hub pairs live in the same cell);
    // margins inside the blocked form use within-cell neighbor means
    // (the honest approximation — printed, not hidden).
    if (phaseSel == "mining") {
      val lastDir = s"$root/n${sizes.last}"
      genEmbeddings(spark, sizes.last, lastDir, ClusteredEmbExpr)
      Seq(2000L, 4000L, 8000L).foreach { nv =>
        val vecs = spark.read.parquet(s"$lastDir/embeddings.parquet")
          .filter(col("vec_id") < nv)
        // halves alternate in 20-blocks, NOT by parity: the synthetic
        // corpus clusters by id % 20, so a parity carve would hand the
        // two pools DISJOINT clusters (measured: zero shared IVF cells,
        // zero blocked candidates) — the driver's real embeddings table
        // has no such correlation, so q334's parity carve stays valid
        val half = (col("vec_id") / 20).cast("long") % 2
        val xs = vecs.filter(half === 0)
          .select(col("vec_id").as("sx"), col("embedding").as("xe"))
        val ys = vecs.filter(half === 1)
          .select(col("vec_id").as("ty"), col("embedding").as("ye"))
        graft.functions.GraftFunctions.register(spark)
        def cosCol = ops.MiningOps.pairCos.as("cos")
        var exact: org.apache.spark.sql.DataFrame = null
        phase("mining_exact_allpairs", nv) {
          exact = ops.MiningOps.minePairs(
            xs.crossJoin(ys).select(col("sx"), col("ty"), cosCol))
            .filter(col("mutual")).localCheckpoint()
          exact.count()
        }
        val kk = math.max(2L, nv / 100)
        val seeds = vecs.filter(col("vec_id") < kk)
          .select(col("vec_id").as("seed_id"), col("embedding").as("se"))
        // probe-side multi-probe: each x enters its top-P nearest cells
        // while the y index stays single-cell — the q59/q106 recall dial
        // (k = nv/100 fragments each true cluster into sibling cells, so
        // single-probe recall MUST crater; the curve shows the fix)
        def topP(vs: org.apache.spark.sql.DataFrame, idOut: String,
                 p: Int): org.apache.spark.sql.DataFrame = {
          import org.apache.spark.sql.expressions.Window
          vs.crossJoin(broadcast(seeds))
            .select(col(idOut), col("seed_id"),
              ops.MiningOps.cosOf("xe0", "se").as("sc"))
            .withColumn("pr", row_number().over(
              Window.partitionBy(col(idOut)).orderBy(col("sc").desc, col("seed_id"))))
            .filter(col("pr") <= p)
            .select(col(idOut), col("seed_id"))
        }
        val ay = ops.VectorSearch.assignToSeeds(
          ys.select(col("ty").as("vec_id"), col("ye").as("embedding")), seeds)
          .select(col("vec_id").as("ty"), col("seed_id")).localCheckpoint()
        val nExact = exact.count()
        val nPairsExact = (nv / 2) * (nv / 2)
        Seq(1, 2, 4).foreach { np =>
          var blocked: org.apache.spark.sql.DataFrame = null
          var nCand = 0L
          phase(s"mining_blocked_k${kk}_np$np", nv) {
            val ax = topP(xs.select(col("sx"), col("xe").as("xe0")), "sx", np)
            val cand = ax.join(ay, Seq("seed_id"))
              .join(xs, Seq("sx")).join(ys, Seq("ty"))
              .select(col("sx"), col("ty"), cosCol)
              .dropDuplicates("sx", "ty").localCheckpoint()
            nCand = cand.count()
            blocked = ops.MiningOps.minePairs(cand)
              .filter(col("mutual")).localCheckpoint()
            blocked.count()
          }
          val hit = exact.select(col("src_id"), col("tgt_id"))
            .join(blocked.select(col("src_id"), col("tgt_id")),
              Seq("src_id", "tgt_id"), "left_semi").count()
          println(s"""SCALE {"phase":"mining_recall","docs":$nv,"k":$kk,""" +
            s""""nprobe":$np,"cand_exact":$nPairsExact,"cand_blocked":$nCand,""" +
            s""""mutual_exact":$nExact,"mutual_blocked_hit":$hit,""" +
            // empty exact set → vacuous recall 1.0, never NaN (a NaN here
            // is not valid JSON and breaks bench-log parsing — ADVICE r15)
            s""""recall":${f(if (nExact == 0) 1.0 else hit.toDouble / nExact)}}""")
        }
        ops.CacheRegistry.clear(spark)
      }
      spark.stop(); return
    }
    // ---- layout write path: q327/q329's payoff measured on REAL files ----
    // The audits predict per-bucket envelopes; this phase WRITES an
    // orders-shaped table in each layout (64 files via repartitionByRange
    // on the curve key) and reads the actual parquet footers back. Two
    // channels per (layout, predicate): the FOOTER decision (row groups /
    // files / bytes a min/max pruner cannot skip — LayoutWrite.pruneStats
    // over physical statistics) and the ENGINE observation (task-metric
    // bytesRead + wall for the filtered count — Spark's own row-group
    // skipping riding the same footers). LayoutWriteSpec separately pins
    // audit-envelope == footer-stat equality bucket-for-bucket at sf0.001.
    if (phaseSel == "layout") {
      sizes.foreach { n =>
        // deterministic orders-shaped frame: ck uniform over 100k keys
        // (Knuth multiplicative hash), od uniform over ~2400 days
        val o = spark.range(0, n, 1, 32)
          .select((pmod(col("id") * 2654435761L, lit(100000L)) + 1).as("ck"),
            date_add(lit("1992-01-01").cast("date"),
              pmod(col("id") * 40503L, lit(2400L)).cast("int")).as("od"))
          .localCheckpoint()
        val odLo = o.agg(min(datediff(col("od"), lit("1970-01-01")))).collect()(0).getInt(0)
        val base = s"$root/layout-n$n"
        // predicate classes: point on dim 1, range on dim 2, box on both
        val preds = Seq(
          "point_ck" -> ops.LayoutWrite.Box(Some(50000L), Some(50000L), None, None),
          "range_od" -> ops.LayoutWrite.Box(None, None, Some(odLo + 1200), Some(odLo + 1229)),
          "box_both" -> ops.LayoutWrite.Box(Some(50000L), Some(56250L),
            Some(odLo + 1200), Some(odLo + 1289)))
        Seq("hash", "sort_ck", "zorder", "hilbert").foreach { l =>
          phase(s"layout_write_$l", n) {
            ops.LayoutWrite.writeLayout(o, l, s"$base/$l", files = 64); n
          }
          val rgs = ops.LayoutWrite.footerStats(spark, s"$base/$l")
          preds.foreach { case (pname, box) =>
            val (rgHit, rgTot, fHit, fTot, bHit, bTot) =
              ops.LayoutWrite.pruneStats(rgs, box)
            // engine channel: filtered count over the written files
            val i0 = inputBytes.get()
            val t0 = System.nanoTime()
            val nOut = spark.read.parquet(s"$base/$l")
              .filter(box.ckLo.map(v => col("ck") >= v).getOrElse(lit(true)) &&
                box.ckHi.map(v => col("ck") <= v).getOrElse(lit(true)) &&
                box.odLo.map(v => datediff(col("od"), lit("1970-01-01")) >= v)
                  .getOrElse(lit(true)) &&
                box.odHi.map(v => datediff(col("od"), lit("1970-01-01")) <= v)
                  .getOrElse(lit(true)))
              .count()
            val wall = (System.nanoTime() - t0) / 1e9
            Thread.sleep(300) // let task-end events drain
            val mbRead = (inputBytes.get() - i0) / 1e6
            println(s"""SCALE {"phase":"layout_prune_${l}_$pname","docs":$n,""" +
              s""""rg_hit":$rgHit,"rg_total":$rgTot,"files_hit":$fHit,""" +
              s""""files_total":$fTot,"footer_mb_hit":${f(bHit / 1e6)},""" +
              s""""footer_mb_total":${f(bTot / 1e6)},"rows_out":$nOut,""" +
              s""""read_mb":${f(mbRead)},"read_wall_s":${f(wall)}}""")
          }
        }
      }
      spark.stop(); return
    }
    if (phaseSel == "triangles") {
      import spark.implicits._
      sizes.foreach { n =>
        val nodes = n / 10
        val bg = spark.range(0, nodes * 3, 1, 32)
          .select((col("id") % nodes).as("u"),
            (abs(xxhash64(concat(lit("e:"), col("id").cast("string")))) % nodes)
              .as("v"))
        val hub = spark.range(0, nodes / 20, 1, 32)
          .select(lit(0L).as("u"),
            (abs(xxhash64(concat(lit("h:"), col("id").cast("string")))) % nodes)
              .as("v"))
        val e = bg.unionAll(hub)
          .select(least(col("u"), col("v")).as("u"),
            greatest(col("u"), col("v")).as("v"))
          .filter(col("u") =!= col("v")).distinct()
          .localCheckpoint()
        val deg = ops.GraphOps.degrees(e).localCheckpoint()
        phase("q276_naive_wedges", nodes) {
          deg.agg((sum(col("dg") * (col("dg") - 1)) / 2).cast("long"))
            .collect()(0).getLong(0)
        }
        val oe = ops.GraphOps.orientEdges(e, deg)
        phase("q276_oriented_wedges", nodes) {
          ops.GraphOps.orientedWedges(oe).count()
        }
        phase("q276_triangles_e2e", nodes) {
          val closing = oe.select(col("src").as("v1"), col("dst").as("v2"))
          ops.GraphOps.orientedWedges(oe).join(closing, Seq("v1", "v2")).count()
        }
      }
      spark.stop(); return
    }
    // ---- q222 contamination: the broadcast-probe linearity claim ----
    // The report is a semi-join of train grams against the (broadcast)
    // eval gram set — NO pair blowup is possible by construction, unlike
    // the dedup family's candidate joins. Measured claim: doubling the
    // corpus doubles train grams, report rows, and shuffle (the per-doc
    // count aggregate) — all ~2.0× at 2× docs, nothing quadratic. Runs
    // against the cached 'all'-loop corpora (50k-word vocabulary, 1%
    // boilerplate-prefix docs — the prefix makes REAL cross-partition
    // gram collisions, so hit counts are nonzero).
    if (phaseSel == "contam") {
      sizes.foreach { n =>
        val docs = spark.read.parquet(s"$root/n$n/documents.parquet")
        phase("q222_train_grams", n) {
          ops.TextDedup.shingleRowsFor(docs)
            .filter(col("doc_id") % 97 =!= 0).count()
        }
        phase("q222_report", n) {
          ops.Governance.contaminationFor(ops.TextDedup.shingleRowsFor(docs))
            .count()
        }
        phase("q222_contaminated", n) {
          ops.Governance.contaminationFor(ops.TextDedup.shingleRowsFor(docs))
            .filter(col("n_hit") > 0).count()
        }
      }
      spark.stop(); return
    }

    // ---- q41 signature width: recall/precision vs k (graft.minhash.*) ----
    // The default 8-hash/2-row signature is oracle-friendly but thin: at
    // Jaccard s, b bands of r rows catch a pair with prob 1−(1−s^r)^b.
    // Planted truth is EXACT here — per-pair 3-shingle Jaccard over the
    // family docs — so recall is measured per similarity bin (the weak
    // family, J 0.5–0.7, is where band count decides) and precision is
    // true-candidates over all candidates. Cap OFF so the boilerplate
    // family contributes its real false-positive mass.
    if (phaseSel == "minhash") {
      val n = sizes.min
      val mdir = s"$root/n$n"
      gen(spark, n, mdir)
      val docs = spark.read.parquet(s"$mdir/documents.parquet")
      val sh = ops.TextDedup.shingleRowsFor(docs).persist()
      sh.count()
      // exact planted-pair Jaccard: families are the 6-doc blocks {0..5}
      // per 100 ids; intersections via the (h1,h2) equi-join within family
      val fam = sh.filter(pmod(col("doc_id"), lit(100L)) <= 5)
        .withColumn("fam", col("doc_id") - pmod(col("doc_id"), lit(100L)))
      val szs = fam.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = fam.as("a").join(fam.as("b"),
          col("a.fam") === col("b.fam") && col("a.h1") === col("b.h1") &&
            col("a.h2") === col("b.h2") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("ix"))
      val truth = inter
        .join(szs.select(col("doc_id").as("da"), col("sz").as("sa")), "da")
        .join(szs.select(col("doc_id").as("db"), col("sz").as("sb")), "db")
        .select(col("da"), col("db"),
          (col("ix").cast("double") / (col("sa") + col("sb") - col("ix")))
            .as("jac"))
        .filter(col("jac") >= 0.5)
        .persist()
      val binned = truth.groupBy((col("jac") >= 0.7).as("hi")).count()
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val tMid = binned.getOrElse(false, 0L)
      val tHi = binned.getOrElse(true, 0L)
      println(s"""SCALE {"phase":"q41_width_truth","docs":$n,""" +
        s""""true_pairs_mid":$tMid,"true_pairs_hi":$tHi}""")
      for ((k, r) <- Seq((8, 2), (64, 2), (128, 2))) {
        spark.conf.set("graft.minhash.hashes", k.toString)
        spark.conf.set("graft.minhash.bandRows", r.toString)
        var cands: DataFrame = null
        phase(s"q41_width_k${k}_cands", n) {
          cands = ops.TextDedup.bandCandidates(ops.TextDedup.bandRows(sh))
            .persist()
          cands.count()
        }
        val nC = cands.count()
        val hits = cands.join(truth,
            cands("doc_a") === truth("da") && cands("doc_b") === truth("db"))
          .groupBy((col("jac") >= 0.7).as("hi")).count()
          .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
        val hMid = hits.getOrElse(false, 0L)
        val hHi = hits.getOrElse(true, 0L)
        def rat(a: Long, b: Long) = if (b == 0) 1.0 else a.toDouble / b
        println(s"""SCALE {"phase":"q41_width_k${k}_recall","docs":$n,""" +
          s""""cands":$nC,"recall_mid":${f(rat(hMid, tMid))},""" +
          s""""recall_hi":${f(rat(hHi, tHi))},""" +
          s""""precision":${f(rat(hMid + hHi, nC))}}""")
        cands.unpersist()
      }
      spark.conf.unset("graft.minhash.hashes")
      spark.conf.unset("graft.minhash.bandRows")
      spark.stop(); return
    }

    // ---- PQ/ADC recall on the clustered vs uniform corpus twins ----
    // q293's registered query pins one query vector strictly; this phase
    // answers the question the spec's worst-case floor can't: what recall
    // does the 8×6-bit code + ADC search deliver where PQ is actually
    // deployed — embeddings WITH cluster geometry — vs the structureless
    // twin. 20 query vectors (outside the codebook), recall@10 = overlap
    // with the exact-L2 top-10 (adc/L2 tiebreaks both by vec_id).
    if (phaseSel == "pq") {
      val n = sizes.min
      for ((expr_, tag) <- Seq((ClusteredEmbExpr, "clustered"),
        (UniformEmbExpr, "uniform"))) {
        val pdir = s"$root/pq_$tag$n"
        genEmbeddings(spark, n, pdir, expr_)
        for ((pm, pk, residual) <- Seq((8, 64, false), (8, 256, false),
          (16, 256, false), (8, 64, true), (8, 256, true), (16, 256, true))) {
          spark.conf.set("graft.pq.m", pm.toString)
          spark.conf.set("graft.pq.k", pk.toString)
          var recallSum = 0.0
          var rerankSum = 0.0
          val kind = if (residual) "res" else "raw"
          phase(s"q293_pq_${tag}_${kind}_m${pm}k$pk", n) {
            (256L until 276L).foreach { qid =>
              val f =
                if (residual)
                  ops.VectorSearch.pqResidualAdcFor(spark, pdir, qid, nprobe = 0)
                else ops.VectorSearch.pqAdcFor(spark, pdir, qid)
              val adc100 = f.orderBy(col("adc_dist"), col("vec_id"))
                .limit(100).select(col("vec_id")).collect().map(_.getLong(0))
              val l2Top = f.orderBy(col("true_l2"), col("vec_id"))
                .limit(10).select(col("vec_id")).collect().map(_.getLong(0)).toSet
              recallSum += (adc100.take(10).toSet & l2Top).size / 10.0
              // the deployed two-stage shape: exact rerank of the ADC
              // top-100 — its ceiling is how much of the true top-10 the
              // candidate set retains
              rerankSum += (adc100.toSet & l2Top).size / 10.0
            }
            20L
          }
          println(s"""SCALE {"phase":"q293_pq_${tag}_${kind}_m${pm}k${pk}_recall",""" +
            s""""docs":$n,"recall_at_10":${f(recallSum / 20.0)},""" +
            s""""top10_in_adc100":${f(rerankSum / 20.0)}}""")
          ops.CacheRegistry.clear(spark)
        }
        spark.conf.unset("graft.pq.m")
        spark.conf.unset("graft.pq.k")
      }
      spark.stop(); return
    }

    // ---- recall vs nprobe on the clustered twin (residual IVF-PQ) ----
    // nprobe is THE deployed recall knob of IVF-PQ: it trades scanned
    // lists (cost ∝ nprobe/L of the corpus at scan time — here L = 20)
    // against coverage of the true neighbors' lists. Measured where the
    // knob matters — the clustered twin, residual codes — at the default
    // (8,64) geometry and the (16,256) real-recall geometry: for 20
    // query vectors, how much of the exact FULL-corpus L2 top-10 the
    // probed ADC top-100 candidate set retains (the exact-rerank
    // ceiling), plus the scanned-candidate fraction (the cost axis).
    if (phaseSel == "nprobe") {
      val n = sizes.min
      // SPARK_GRAFT_NPROBE_TAG reruns a single twin (clustered|overlap|mixed)
      val tagSel = sys.env.get("SPARK_GRAFT_NPROBE_TAG")
      for ((embExpr, tag) <- Seq((ClusteredEmbExpr, "clustered"),
        (OverlapEmbExpr, "overlap"), (MixedEmbExpr, "mixed"))
        if tagSel.forall(_ == tag)) {
      val pdir = s"$root/pq_$tag$n"
      genEmbeddings(spark, n, pdir, embExpr)
      for ((pm, pk) <- Seq((8, 64), (16, 256))) {
        spark.conf.set("graft.pq.m", pm.toString)
        spark.conf.set("graft.pq.k", pk.toString)
        // exact ground truth per qid, computed once (nprobe = 0 scans all
        // lists and carries true_l2 for every vector)
        val truth = (256L until 276L).map { qid =>
          qid -> ops.VectorSearch.pqResidualAdcFor(spark, pdir, qid, nprobe = 0)
            .orderBy(col("true_l2"), col("vec_id"))
            .limit(10).select(col("vec_id")).collect().map(_.getLong(0)).toSet
        }.toMap
        for (np <- Seq(1, 2, 4, 8)) {
          var recallSum = 0.0
          var candSum = 0L
          phase(s"q295_${tag}_nprobe_${np}_m${pm}k$pk", n) {
            (256L until 276L).foreach { qid =>
              val fr = ops.VectorSearch
                .pqResidualAdcFor(spark, pdir, qid, nprobe = np)
              candSum += fr.count()
              val adc100 = fr.orderBy(col("adc_dist"), col("vec_id"))
                .limit(100).select(col("vec_id")).collect().map(_.getLong(0))
              recallSum += (adc100.toSet & truth(qid)).size / 10.0
            }
            20L
          }
          println(s"""SCALE {"phase":"q295_${tag}_nprobe_${np}_m${pm}k${pk}_recall",""" +
            s""""docs":$n,"top10_in_adc100":${f(recallSum / 20.0)},""" +
            s""""scanned_frac":${f(candSum / 20.0 / (n - 1))}}""")
        }
        spark.conf.unset("graft.pq.m")
        spark.conf.unset("graft.pq.k")
        ops.CacheRegistry.clear(spark)
      }
      }
      spark.stop(); return
    }

    // ---- the composed dedup funnel, end to end at two sizes ----
    // q283 is the report a nightly curation run lands; its PIECES are
    // measured linear individually (shingles, capped pairs, CC) but the
    // composition — shingle cache → exact fp → overlap pairs → CC →
    // keeper → report, stitched through the shared CacheRegistry frames —
    // is what a user actually runs. Each stage runs as the REAL registered
    // query (so the memoized caches compose exactly as in production),
    // with the skew cap ON — the 100 TB configuration; the boilerplate
    // family would otherwise contribute its quadratic hot-key mass.
    // Linearity = wall/shuffle ratios ≈ 2× between the two sizes.
    if (phaseSel == "funnel") {
      // SPARK_GRAFT_MINHASH_K re-runs the composition at a production
      // signature width (k=64 is the documented 100 TB sweet spot —
      // 7.4× the default's band shuffle); default leaves the oracle width
      val widthK = sys.env.get("SPARK_GRAFT_MINHASH_K")
      val tag = widthK.map(k => s"_k$k").getOrElse("")
      sizes.foreach { n =>
        val fdir = s"$root/n$n"
        gen(spark, n, fdir)
        spark.conf.set("graft.textdedup.maxShingleDf", "64")
        widthK.foreach(k => spark.conf.set("graft.minhash.hashes", k))
        Seq("q40_dedup_exact", "q41_minhash_lsh", "q42_ngram_jaccard",
          "q72_neardup_clusters", "q277_cluster_keeper", "q283_dedup_funnel")
          .foreach { qn =>
            phase(s"funnel_$qn$tag", n) {
              SparkEntry.queries(qn)(spark, fdir).count()
            }
          }
        // q283 again with every family cache warm: the first run's shuffle
        // mixes report work with whatever cache composition it first
        // touches (the r12 table's 2.8×-growth column); the repeat is the
        // steady-state report cost, so the delta IS the composition term
        // (VERDICT r12 item 6 attribution).
        phase(s"funnel_q283_repeat$tag", n) {
          SparkEntry.queries("q283_dedup_funnel")(spark, fdir).count()
        }
        spark.conf.unset("graft.textdedup.maxShingleDf")
        widthK.foreach(_ => spark.conf.unset("graft.minhash.hashes"))
        ops.CacheRegistry.clear(spark)
      }
      spark.stop(); return
    }
        // ---- q152 interval join: candidate growth at fixed event rate ----
    // The claim to verify: with the event RATE held constant (span grows
    // with N — the realistic 100 TB regime: more history, same traffic),
    // the bucketized range join's candidate volume grows ~linearly in N,
    // because each error probes a CONSTANT expected number of clicks
    // (rate × 3 buckets). The naive theta join compares every error to
    // every click — O(N²) growth — measured once at the smaller size as
    // the control you must not ship. Events are xxhash-deterministic:
    // 1 event/s mean with sub-second jitter, 5 types round-robin by hash.
    def eventPhases(): Unit = {
      val W = 120000000L
      def genEvents(n: Long, dir: String): Unit = {
        val p = java.nio.file.Paths.get(s"$dir/events.parquet")
        if (!java.nio.file.Files.exists(p)) {
          spark.range(0, n).toDF("id")
            .select(col("id").as("event_id"),
              expr("""timestamp_micros(CAST(1704067200000000 AS BIGINT)
                     | + id * 1000000
                     | + pmod(xxhash64(concat('jit:', CAST(id AS STRING))), 1000000))"""
                .stripMargin).as("ts"),
              expr("""element_at(array('click','view','error','signup','purchase'),
                     | CAST(pmod(xxhash64(concat('et:', CAST(id AS STRING))), 5) AS INT) + 1)"""
                .stripMargin).as("event_type"))
            .write.mode("overwrite").parquet(p.toString)
        }
      }
      sizes.foreach { n =>
        val edir = s"$root/ev$n"
        genEvents(n, edir)
        val ev = spark.read.parquet(s"$edir/events.parquet")
          .select(col("event_id"), col("event_type"),
            expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
        val probes = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("eid"), col("us").as("eus"),
            explode(expr(s"array(us DIV $W - 1, us DIV $W, us DIV $W + 1)")).as("bkt"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), expr(s"us DIV $W").as("bkt"),
            col("us").as("cus"))
        // equi-join candidates BEFORE the residual — the volume the
        // bucketing admits (mirrors PipelineOps q152's probe join)
        phase("q152_bucket_cands", n) {
          probes.join(clicks, Seq("bkt")).count()
        }
        phase("q152_full_query", n) {
          SparkEntry.queries("q152_interval_join")(spark, edir).count()
        }
        // control at the SMALLER size only: the all-pairs comparison
        // count the bucketing avoids (grows ~4× per corpus doubling)
        if (n == sizes.min) phase("q152_naive_theta", n) {
          val e = ev.filter(col("event_type") === "error")
            .select(col("event_id").as("eid"), col("us").as("eus"))
          val c = ev.filter(col("event_type") === "click")
            .select(col("event_id").as("cid"), col("us").as("cus"))
          e.join(c, abs(col("cus") - col("eus")) <= W).count()
        }
        ops.CacheRegistry.clear(spark)
      }
    }
    if (phaseSel == "events") { eventPhases(); spark.stop(); return }
    // ---- CC chain regime (pointer vs star engines) ----
    // A single path graph of diameter n — the adversarial shape for label
    // propagation (the near-dup clique regime the q72 phases measure
    // converges in ~1 round regardless of engine). Both engines run a
    // per-partition union-find pre-pass, so the loop starts from effective
    // diameter ≈ #partitions, not n; rounds ≈ log₂(parts) plus
    // confirmation. Parity: both must emit n nodes in ONE component rooted
    // at 0 (rows_out = n — the filter proves the root). Wall and
    // shuffle_mb compare loop volume; no corpus generation needed.
    if (phaseSel == "cc") {
      sizes.foreach { n =>
        val chainPairs = spark.range(0, n - 1, 1, 32)
          .select(col("id").as("doc_a"), (col("id") + lit(1L)).as("doc_b"))
        phase("cc_chain_pointer", n) {
          ops.TextDedup.clusterPairs(spark, chainPairs)
            .filter(col("cluster_id") === 0).count()
        }
        spark.conf.set("graft.textdedup.ccAlgo", "star")
        try phase("cc_chain_star", n) {
          ops.TextDedup.clusterComponents(spark, chainPairs)
            .filter(col("cluster_id") === 0).count()
        } finally spark.conf.unset("graft.textdedup.ccAlgo")
      }
      spark.stop(); return
    }
    if (phaseSel == "image") sizes.foreach { n =>
      val dir = s"$root/n$n"
      gen(spark, n, dir)
      imagePhases(dir, n)
    }
    if (phaseSel == "spans") sizes.foreach { n =>
      val dir = s"$root/n$n"
      gen(spark, n, dir)
      phase("q108_dup_spans", n) {
        ops.SubstringOps.dupSpanGroups(spark, dir).count()
      }
      phase("q141_span_coalesce", n) {
        ops.SubstringOps.dupSpanIntervals(spark, dir).count()
      }
      ops.CacheRegistry.clear(spark)
    }
    if (phaseSel == "all") sizes.foreach { n =>
      val dir = s"$root/n$n"
      val tGen0 = System.nanoTime()
      gen(spark, n, dir)
      println(s"SCALE corpus n=$n dir=$dir gen_s=${f((System.nanoTime() - tGen0) / 1e9)} " +
        s"bytes=${spark.read.parquet(s"$dir/documents.parquet").inputFiles.map(p =>
          new java.io.File(new java.net.URI(p).getPath).length()).sum}")
      phase("scan_count", n) {
        spark.read.parquet(s"$dir/documents.parquet").count()
      }
      phase("q40_exact", n) {
        SparkEntry.queries("q40_dedup_exact")(spark, dir).count()
      }
      // substring-level exact dedup: dup-span groups must grow linearly
      // (each near-dup family contributes its shared spans; the boilerplate
      // header contributes a CONSTANT ~15 groups whose n_docs grows instead)
      // and the group shuffle carries only (md5, counts) — see q108's
      // rejoin design note
      phase("q108_dup_spans", n) {
        ops.SubstringOps.dupSpanGroups(spark, dir).count()
      }
      // span coalescing (q141): removal-interval count must track the
      // dup-span group count linearly — each near-dup family contributes
      // per-member intervals, the boilerplate header ONE interval per doc;
      // the per-doc window adds no cross-doc shuffle beyond the dup join
      phase("q141_span_coalesce", n) {
        ops.SubstringOps.dupSpanIntervals(spark, dir).count()
      }
      imagePhases(dir, n)
      // ---- cap OFF: the quadratic boilerplate pathology is visible ----
      phase("overlap_pairs_capOFF", n)(ops.TextDedup.overlapPairCount(spark, dir))
      phase("q41_lsh_capOFF", n) {
        SparkEntry.queries("q41_minhash_lsh")(spark, dir).count()
      }
      phase("q42_jaccard_capOFF", n) {
        SparkEntry.queries("q42_ngram_jaccard")(spark, dir).count()
      }
      // containment shares the exact-overlap join, so it inherits the same
      // C(df,2) boilerplate pathology — measured uncapped here, capped below
      phase("q112_containment_capOFF", n) {
        SparkEntry.queries("q112_shingle_containment")(spark, dir).count()
      }
      // ---- cap ON (maxDf=10): header shingles (df = n/100) drop out,
      // family shingles (df ≤ 4) survive → candidates stay linear ----
      spark.conf.set("graft.textdedup.maxShingleDf", "10")
      try {
        phase("overlap_pairs_capON", n)(ops.TextDedup.overlapPairCount(spark, dir))
        phase("q41_lsh_capON", n) {
          SparkEntry.queries("q41_minhash_lsh")(spark, dir).count()
        }
        phase("q42_jaccard_capON", n) {
          SparkEntry.queries("q42_ngram_jaccard")(spark, dir).count()
        }
        phase("q112_containment_capON", n) {
          SparkEntry.queries("q112_shingle_containment")(spark, dir).count()
        }
        phase("q72_clusters_capON", n) {
          SparkEntry.queries("q72_neardup_clusters")(spark, dir).count()
        }
        // same pairs (memoized jaccardPairs cache is warm from the phase
        // above, so both walls measure the CC loop, not pair generation),
        // alternative engine: large-star/small-star contraction. Parity =
        // identical rows_out; shuffle_mb compares total loop volume.
        spark.conf.set("graft.textdedup.ccAlgo", "star")
        try phase("q72_clusters_star_capON", n) {
          SparkEntry.queries("q72_neardup_clusters")(spark, dir).count()
        } finally spark.conf.unset("graft.textdedup.ccAlgo")
      } finally spark.conf.unset("graft.textdedup.maxShingleDf")
      // ---- grouped stitch vs naive per-source window (q90/q91 engine) ----
      // Skewed source distribution: ~91% of rows in ONE source, so the
      // naive Window.partitionBy(source) funnels 91% of the corpus through
      // a single task while the stitch spreads it across range buckets.
      // Parity: phases return a rank-sensitive checksum (Σ f(rn)·g(doc_id),
      // bounded well under Long overflow) — identical values between the
      // naive and stitched phases prove identical per-row results; wall
      // and shuffle_mb are the measurement.
      val skewedSrc = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("n_chars"),
          when(pmod(col("doc_id"), lit(100L)) < 91, lit("hot"))
            .otherwise(concat(lit("s"), pmod(col("doc_id"), lit(100L)))).as("src"))
      def rnChecksum(df: DataFrame, c: String): Long =
        df.agg(sum(pmod(col(c), lit(1000003L)) * pmod(col("doc_id"), lit(97L))))
          .head().getLong(0)
      val stitchParts = cpus.toInt
      phase("stitch_rownum_naive", n) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("src")).orderBy(col("doc_id"))
        rnChecksum(skewedSrc.withColumn("rn", row_number().over(w).cast("long")), "rn")
      }
      phase("stitch_rownum_grouped", n) {
        rnChecksum(ops.Skew.groupedRowNumber(skewedSrc, Seq("src"),
          Seq(col("doc_id")), stitchParts, "rn"), "rn")
      }
      phase("stitch_cumsum_naive", n) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("src")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        rnChecksum(skewedSrc.withColumn("cum", sum(col("n_chars")).over(w)), "cum")
      }
      phase("stitch_cumsum_grouped", n) {
        rnChecksum(ops.Skew.groupedRunningSum(skewedSrc, Seq("src"),
          Seq(col("doc_id")), col("n_chars"), stitchParts, "cum"), "cum")
      }
      // ---- salted vs plain shuffled join under one hot key (q105 engine) ----
      // 90% of fact rows carry key 0; the dim table is forced OUT of
      // broadcast range (at 100 TB a dimension outgrows broadcast — that
      // is the regime salting exists for), so the plain join is a shuffled
      // hash join with one reducer owning the hot key, and the salted join
      // spreads it across 8. Parity: identical joined-row counts.
      val joinFact = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(10L)) < 9, lit(0L))
            .otherwise(pmod(col("doc_id"), lit(1000L))).as("k"))
      val joinDim = spark.range(0, 1000).toDF("k")
        .withColumn("payload", xxhash64(col("k")))
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        phase("salt_join_plain", n) {
          joinFact.join(joinDim, Seq("k")).count()
        }
        phase("salt_join_salted", n) {
          ops.Skew.saltedJoin(joinFact, joinDim, "k", "doc_id", buckets = 8).count()
        }
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      // ---- ANN family: timing + recall against the planted clusters ----
      genEmbeddings(spark, n, dir, ClusteredEmbExpr)
      phase("q44_bruteforce", n) {
        SparkEntry.queries("q44_cosine_topk")(spark, dir).count()
      }
      phase("q45_ann_lsh", n) {
        SparkEntry.queries("q45_ann_lsh")(spark, dir).count()
      }
      phase("q59_ann_ivf", n) {
        SparkEntry.queries("q59_ann_ivf")(spark, dir).count()
      }
      phase("q106_ann_multiprobe", n) {
        SparkEntry.queries("q106_ann_multiprobe")(spark, dir).count()
      }
      // recall of the approximate paths vs the exact top-k (warm reruns);
      // denominators are the ACTUAL exact-result sizes so a small debug
      // corpus (exact top-k shorter than k) can't deflate recall silently
      def topIds(d: String)(name: String, k: Int): Seq[Long] =
        SparkEntry.queries(name)(spark, d).limit(k)
          .collect().map(_.getLong(0)).toSeq
      def recallLine(phaseName: String, d: String): Unit = {
        val ids = topIds(d) _
        val exact10 = ids("q44_cosine_topk", 10)
        val exact5 = exact10.take(5)
        val rLsh = exact10.intersect(ids("q45_ann_lsh", 10)).size.toDouble /
          math.max(exact10.size, 1)
        val rMulti = exact10.intersect(ids("q106_ann_multiprobe", 10)).size.toDouble /
          math.max(exact10.size, 1)
        val rIvf = exact5.intersect(ids("q59_ann_ivf", 5)).size.toDouble /
          math.max(exact5.size, 1)
        println(s"""SCALE {"phase":"$phaseName","docs":$n,""" +
          s""""recall_lsh_at10":${f(rLsh)},"recall_multiprobe_at10":${f(rMulti)},""" +
          s""""recall_ivf_at5":${f(rIvf)}}""")
      }
      recallLine("ann_recall", dir)
      // ---- probe-width sweep: recall@10 vs candidate count at Hamming
      // radius 0 (q45's single probe), 1 (q106), 2 (+double flips) —
      // the full recall/cost curve of the one tunable the multi-probe
      // design exposes. Runs on the planted corpus AND the adversarial
      // uniform one (no structure → widening probes buys candidates, not
      // recall — the honest negative result). ----
      def probeSweep(phaseName: String, d: String): Unit = {
        val exact10 = topIds(d)("q44_cosine_topk", 10)
        val entries = (0 to 2).map { r =>
          val cand = ops.VectorSearch.multiProbe(spark, d, r)
          val nCand = cand.count()
          val ids = cand.orderBy(col("cos_sim").desc, col("vec_id"))
            .limit(10).collect().map(_.getLong(0)).toSeq
          val rec = exact10.intersect(ids).size.toDouble / math.max(exact10.size, 1)
          s""""radius$r":{"probes":${ops.VectorSearch.probeCount(r)},""" +
            s""""candidates":$nCand,"recall_at10":${f(rec)}}"""
        }
        println(s"""SCALE {"phase":"$phaseName","docs":$n,${entries.mkString(",")}}""")
      }
      probeSweep("probe_sweep", dir)
      // ---- adversarial ANN: UNIFORM vectors (no structure to exploit) ----
      val udir = s"$root/u$n"
      genEmbeddings(spark, n, udir, UniformEmbExpr)
      recallLine("ann_recall_uniform", udir)
      probeSweep("probe_sweep_uniform", udir)
      ops.CacheRegistry.clear(spark) // release this size's persisted frames
    }
    if (phaseSel == "image" || phaseSel == "spans") {
      spark.stop(); return // one-family rerun done
    }
    // ---- q113 semantic dedup: candidate growth under k ∝ N ----
    // The quantity that decides whether SemDeDup scales is the within-
    // cluster pair count Σ C(|c|, 2): with seeds = ceil(N/target), expected
    // cluster size is constant, so candidates must grow ~2× at 2× vectors
    // (the fixed-k design this replaced grew them 4×). Measured on bounded
    // slices of the LAST generated clustered corpus — the assignment's
    // dense argmax is O(N·k) map-side work (the production answer for the
    // clustering step itself is hierarchical seeding, not a bigger argmax),
    // so the phase sizes keep the sweep cheap while the RATIO carries the
    // signal. rows_out = candidate pairs; the wall includes one full
    // semanticDedup run at the smaller slice for an end-to-end datum.
    val lastDir = s"$root/n${sizes.last}"
    genEmbeddings(spark, sizes.last, lastDir, ClusteredEmbExpr) // no-op if current
    Seq(10000L, 20000L, 40000L).filter(_ <= sizes.last).foreach { nv =>
      phase("q113_semdedup_cands", nv) {
        ops.VectorSearch.semanticDedupCandidates(spark, lastDir, Some(nv))
      }
      ops.CacheRegistry.clear(spark)
    }
    phase("q113_semdedup_full", 10000L) {
      ops.VectorSearch.semanticDedup(spark, lastDir, Some(10000L)).count()
    }
    ops.CacheRegistry.clear(spark)
    // ---- hierarchical vs dense assignment: wall + agreement ----
    // The two-level argmax (q123) exists to break the dense pass's O(N·k):
    // at fanout ≈ √k each vector pays g + fanout ≈ 2√k dots instead of k.
    // Agreement = fraction of vectors whose hierarchical seed equals the
    // dense argmax seed — measured, not assumed, on the clustered corpus.
    // Two regimes: k = N/100 (SemDeDup's own seed count — dense is still
    // cheap there) and k = N/10 (the dense-prohibitive regime the
    // two-level argmax exists for — 10× the seeds, where O(N·k) bites).
    Seq(100L, 10L).foreach { target =>
      val nv = 20000L
      val kk = math.ceil(nv / target.toDouble).toLong
      val fanout = math.ceil(math.sqrt(kk.toDouble)).toInt
      val vecs = spark.read.parquet(s"$lastDir/embeddings.parquet")
        .filter(col("vec_id") < nv)
      val seeds = vecs.filter(col("vec_id") < kk)
        .select(col("vec_id").as("seed_id"), col("embedding").as("se"))
      var dense: org.apache.spark.sql.DataFrame = null
      var hier: org.apache.spark.sql.DataFrame = null
      phase(s"assign_dense_k$kk", nv) {
        dense = ops.VectorSearch.assignToSeeds(vecs, seeds)
          .select(col("vec_id"), col("seed_id")).localCheckpoint()
        dense.count()
      }
      phase(s"assign_hier_k$kk", nv) {
        hier = ops.VectorSearch.hierarchicalAssign(vecs, seeds, fanout)
          .select(col("vec_id"), col("seed_id").as("hseed")).localCheckpoint()
        hier.count()
      }
      val agree = dense.join(hier, "vec_id")
        .agg(avg(when(col("seed_id") === col("hseed"), 1.0).otherwise(0.0)))
        .head().getDouble(0)
      println(s"""SCALE {"phase":"assign_agreement","docs":$nv,"k":$kk,""" +
        s""""fanout":$fanout,"agreement":${f(agree)}}""")
    }
    // ---- kNN graph: candidate volume under the plane-count schedule ----
    // The q127 scale knob made measurable: with FIXED code bits, bucket
    // sizes grow ∝ N so Hamming-≤1 candidates grow ∝ N² — the shape you
    // must not ship. Growing the code by one bit per corpus doubling
    // (planes = 6 + log2(N/10k)) keeps expected bucket size constant, so
    // candidates should grow ~linearly. Both schedules measured on the
    // same clustered corpus; the fixed-bit row is the control.
    locally {
      val vecsAll = spark.read.parquet(s"$lastDir/embeddings.parquet")
      Seq((10000L, 6), (20000L, 7), (40000L, 8)).filter(_._1 <= sizes.last)
        .foreach { case (nv, np) =>
          phase(s"q127_knn_cands_planes$np", nv) {
            ops.GraphOps.knnCandidates(vecsAll.filter(col("vec_id") < nv), np).count()
          }
        }
      Seq((20000L, 6), (40000L, 6)).filter(_._1 <= sizes.last)
        .foreach { case (nv, np) =>
          phase(s"q127_knn_cands_fixed$np", nv) {
            ops.GraphOps.knnCandidates(vecsAll.filter(col("vec_id") < nv), np).count()
          }
        }
      // full edge build (codes + probe join + exact cosine + top-3 rank)
      // at the scheduled plane counts: wall should track the ~linear
      // candidate volume, and rows_out stays ≤ 3N
      Seq((10000L, 6), (20000L, 7)).filter(_._1 <= sizes.last)
        .foreach { case (nv, np) =>
          phase(s"q127_knn_edges_planes$np", nv) {
            ops.GraphOps.knnEdgesFrom(vecsAll.filter(col("vec_id") < nv), np).count()
          }
        }
      // PageRank: per-round cost is the narrow edge join + inflow agg —
      // linear in |edges| = 3N under the plane schedule
      Seq((10000L, 6), (20000L, 7)).filter(_._1 <= sizes.last)
        .foreach { case (nv, np) =>
          phase("q128_pagerank_3r", nv) {
            val vecs = vecsAll.filter(col("vec_id") < nv)
            val edges = ops.GraphOps.knnEdgesFrom(vecs, np)
              .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
              .localCheckpoint()
            ops.GraphOps.pagerank(vecs.select(col("vec_id")), edges, 3).count()
          }
        }
      // power iteration: each round is two narrow aggregates over the
      // (vec_id, pos, x) exploded frame — strictly linear in N·dim
      Seq(20000L, 40000L).filter(_ <= sizes.last).foreach { nv =>
        phase("q125_power_3r", nv) {
          ops.VectorSearch.powerIterate(vecsAll.filter(col("vec_id") < nv), 3).count()
        }
      }
      // same candidate schedule on the UNIFORM corpus: without planted
      // structure, every extra code bit halves expected bucket size, so
      // candidates should track ~2× per corpus doubling — the contrast
      // that shows the planted-cluster super-linearity above is the
      // data's duplicate density, not the algorithm's shape
      // regenerate if absent (idempotent via the .version marker) — the
      // semdedup-only path borrows this corpus from the 'all' loop
      genEmbeddings(spark, sizes.last, s"$root/u${sizes.last}", UniformEmbExpr)
      val uvecsAll = spark.read.parquet(s"$root/u${sizes.last}/embeddings.parquet")
      Seq((10000L, 6), (20000L, 7), (40000L, 8)).filter(_._1 <= sizes.last)
        .foreach { case (nv, np) =>
          phase(s"q127_knn_cands_uniform_planes$np", nv) {
            ops.GraphOps.knnCandidates(uvecsAll.filter(col("vec_id") < nv), np).count()
          }
        }
      // ---- count-min sketch: the constant-size-shuffle claim ----
      // q129's design note says the sketch aggregate's key space is the
      // FIXED d·w grid, so map-side partial aggregation pins the shuffle
      // at ≤1024 rows per partition REGARDLESS of corpus size — doubling
      // the docs should leave shuffle bytes ~flat while a vocabulary
      // groupBy's shuffle doubles. Both measured for contrast.
      sizes.filter { n =>
        // the doc corpora are built only by the 'all' loop (minutes of
        // gen); skip with a visible note rather than dying mid-run
        val ok = new java.io.File(s"$root/n$n/documents.parquet").exists()
        if (!ok) println(s"SCALE skipping q129 phases at n=$n: corpus absent " +
          s"(run once with SPARK_GRAFT_SCALE_PHASES=all)")
        ok
      }.foreach { n =>
        val docs = spark.read.parquet(s"$root/n$n/documents.parquet")
        // no qualifying-word filter here: the synthetic corpus words are
        // w<digits>, and the phase measures shuffle shape, not linguistics
        val occ = docs
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
          .select(col("word"), md5(col("word")).as("m"))
          .select(col("word"),
            conv(substring(col("m"), 1, 14), 16, 10).cast("long").as("h1"),
            conv(substring(col("m"), 15, 14), 16, 10).cast("long").as("h2"))
        phase("q129_cms_sketch", n) {
          ops.TextAnalysis.countMinSketch(occ).count()
        }
        phase("q129_vocab_groupby", n) {
          occ.groupBy(col("word")).agg(count(lit(1))).count()
        }
        // ---- Misra–Gries candidate sketch: the bounded-state claim ----
        // q167's pass 1 shuffles ONE ≤2k-entry counter map per partition
        // regardless of vocabulary — like the count-min grid, its shuffle
        // should stay ~flat as docs double while q129_vocab_groupby's
        // doubles. (The synthetic w<digits> vocabulary GROWS with n, so
        // the testdata's never-prunes regime does not apply here — the
        // sketch actually overflows and prunes.)
        phase("q167_mg_sketch", n) {
          import spark.implicits._
          val sketch = graft.functions.MisraGries(1024)
          occ.select(col("word")).as[String]
            .select(sketch.toColumn).toDF("cands")
            .select(explode(col("cands"))).count()
        }
        // ---- blocked edit-distance candidates (q180): boilerplate
        //      block vs the cap ----
        // This corpus draws words from a 50k vocabulary, so ordinary
        // (w1, w2) blocks stay tiny — EXCEPT the 1% of docs that carry
        // the shared Boiler prefix (blockpos = 50), which all land in
        // ONE block. That is precisely the real-corpus pathology
        // (boilerplate openings: "terms of service", "click here to"),
        // and it makes the uncapped pair count quadratic: measured 505k
        // pairs at 100k docs → 2.01M at 200k (4.0× at 2× docs — one
        // 1k-doc block is 500k pairs). With the 32-doc cap the
        // boilerplate block is skipped and candidates are the planted
        // copies alone: 5,634 → 11,332 (2.01× — linear). The cap costs
        // one extra groupBy+join (visible in wall at toy scale) and
        // buys a 90× candidate cut before any Levenshtein runs.
        val langed = docs.withColumn("lang", lit("xx"))
        phase("q180_blocked_cands_capOFF", n) {
          ops.TextDedup.editBlockedPairs(langed, cap = 0).count()
        }
        phase("q180_blocked_cands_capON", n) {
          ops.TextDedup.editBlockedPairs(langed, cap = 32).count()
        }
      }
    }
    if (phaseSel == "all" || phaseSel == "postloop") eventPhases()
    spark.stop()
  }
}
