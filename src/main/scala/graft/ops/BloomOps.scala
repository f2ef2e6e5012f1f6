package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q

/** Bloom-filter eval-set decontamination — the screen a 100 TB training
  * pipeline actually ships (GPT-3 appendix C / PaLM-style n-gram bloom
  * membership) next to the exact join it approximates (q79). The
  * reference moves opaque payloads (`/root/reference/pkg/converter/
  * converter.go:52-57`); decontamination extends the curation surface
  * per the north star.
  *
  * Why a bloom at scale when q79's exact broadcast join exists: the
  * exact screen broadcasts the benchmark's DISTINCT shingle hashes —
  * 8 bytes per shingle, growing with every benchmark added, and the
  * probe pays a hash-join lookup per corpus shingle. The bloom is a
  * FIXED-size bitset chosen once from the FP budget (m ≈ −k·n/ln(1−fp^
  * (1/k)); 2^33 bits = 1 GiB screens ~10⁹ benchmark n-grams at k=4,
  * fp≈2%), the probe is pure arithmetic against a literal array — no
  * join, no shuffle of the corpus side, and the one-sided error is the
  * SAFE direction for decontamination: false positives over-drop
  * training docs; false negatives (leaks) are impossible.
  *
  * Engine parity: positions derive from the dedup family's one-md5
  * shingle hash via the same Kirsch–Mitzenmacher seed family as q41's
  * minhash — pos_i = ((h1 + i·h2) mod (2^61−1)) mod m, overflow-free
  * for i ≤ 127 (h1, h2 < 2^56) — so DuckDB recomputes the identical
  * bitset and the strict hash compare covers the whole structure. Spark
  * ships `bloom_filter_agg`/`might_contain` for its runtime-filter path
  * (q198 exercises it), but its bit layout is engine-private; this
  * md5-derived filter is the oracle-checkable twin.
  *
  * Scale posture of the build side: positions are bounded by m BY
  * CONSTRUCTION (pos ∈ [0, m)) and packed into carrier words before
  * leaving the cluster, so the driver materialization is at most m/64
  * (word, long) rows regardless of corpus size — the `graft.dict.maxRows`
  * bounded-build discipline. At m beyond ~2^27 you'd swap the plan
  * literal for a `SparkContext.broadcast` of the packed longs probed in
  * a native expression (the literal embeds in the plan text); the
  * arithmetic is unchanged.
  */
object BloomOps {

  /** Audit geometry: m = 2^16 bits (1,024 packed longs, 8 KB), k = 4.
    * Baked static so the registered oracle stays strict (the PQ-geometry
    * discipline); sweeps go through [[buildWords]]/[[screen]] directly. */
  private[ops] val MBits = 1 << 16
  private[ops] val KHashes = 4

  /** 2^61 − 1, the dedup family's seed modulus (TextDedup.SeedMod). */
  private[ops] val SeedMod = 2305843009213693951L

  /** Bloom bit positions for one shingle hash pair, as columns. */
  private[ops] def posCols(mBits: Int, k: Int): Seq[Column] =
    (0 until k).map { i =>
      ((col("h1") + lit(i.toLong) * col("h2")) % SeedMod) % mBits
    }

  /** Pack the benchmark's bloom bitset into m/64 longs on the driver.
    * `bench` must be a (h1, h2) frame of the benchmark's shingle hashes.
    * Positions are OR-packed into their carrier words DISTRIBUTIVELY
    * (groupBy word index + bit_or of the single-bit long), so the driver
    * materializes at most m/64 (word, long) rows — 1,024 at the audit
    * geometry, 1M at the 2^26 spec geometry — never one row per distinct
    * position, and never anything proportional to benchmark size
    * (ADVICE r15: the per-position collect was m Row objects, hundreds
    * of MB at large m; the packed form is 64× smaller and the ~2^27
    * plan-literal wall in the scaladoc above now reflects real driver
    * cost). */
  def buildWords(bench: DataFrame, mBits: Int = MBits, k: Int = KHashes): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits ($mBits) must be a positive multiple of 64")
    val pos = bench
      .select(explode(array(posCols(mBits, k): _*)).as("p"))
      .groupBy(shiftright(col("p"), 6).cast("int").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")))
        .as("bits"))
      .collect()
    val words = new Array[Long](mBits / 64)
    pos.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** The production screen: adds boolean `flagged` to a (…, h1, h2)
    * shingle frame by probing the packed bitset — pure codegen'd
    * arithmetic against an array literal, NO join, no shuffle.
    *
    * Carrier regimes (ScaleBench `bloom` phase, SCALE.md round 15): the
    * plan-literal carrier is flat-in-m up to ~2^20 bits (128 KB), then
    * the literal's per-task plan shipping dominates — at 2^24 (2 MB of
    * longs) the probe measured 5–8× slower than at 2^20 on the same
    * frame. Above that, [[screenBroadcast]] carries the SAME bitset as
    * a torrent broadcast probed by a closure — measured back under the
    * small-literal wall at 2^24. Use the literal below ~2^20 bits (it
    * keeps whole-stage codegen), the broadcast above. */
  def screen(shingles: DataFrame, words: Array[Long], mBits: Int = MBits,
             k: Int = KHashes): DataFrame = {
    val bits = typedLit(words.toSeq)
    // dynamic shift amounts need the SQL ShiftRight (the Scala helper
    // only takes a literal); `& 1` not `% 2` — a packed word with bit 63
    // set is negative, and Spark's % follows the dividend's sign
    val flagged = posCols(mBits, k).map { p =>
      call_function("shiftright",
        element_at(bits, shiftright(p, 6).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1
    }.reduce(_ && _)
    shingles.withColumn("flagged", flagged)
  }

  /** [[screen]] with the bitset as a SparkContext broadcast probed by a
    * closure — the carrier for LARGE filters (see [[screen]]'s regime
    * note): the bitset ships once per executor over the torrent
    * protocol instead of riding every task's serialized plan. The probe
    * itself is identical arithmetic; BloomDecontSpec pins carrier
    * equality row for row. */
  def screenBroadcast(shingles: DataFrame, words: Array[Long],
                      mBits: Int = MBits, k: Int = KHashes): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits ($mBits) must be a positive multiple of 64")
    val bc = shingles.sparkSession.sparkContext.broadcast(words)
    val kk = k
    val m = mBits.toLong
    val probe = udf { (h1: Long, h2: Long) =>
      val w = bc.value
      var i = 0
      var ok = true
      while (ok && i < kk) {
        val p = ((h1 + i * h2) % SeedMod) % m
        ok = ((w((p >>> 6).toInt) >>> (p & 63).toInt) & 1L) == 1L
        i += 1
      }
      ok
    }
    shingles.withColumn("flagged", probe(col("h1"), col("h2")))
  }

  val qs: Seq[Q] = Seq(

    // ---- q325: bloom decontamination audit ----
    // Per flagged training doc: shingles the bloom flags, shingles truly
    // in the benchmark set (q79 semantics — the exact join exists here
    // only to MEASURE the bloom), and the false-positive overcount. The
    // no-false-negative guarantee is structural (a true member's k
    // positions are set by construction), so n_fp ≥ 0 row-by-row and
    // n_true agrees with q79's n_hits — both pinned in BloomDecontSpec.
    Q("q325_bloom_decontaminate", {
      val posSel = (0 until KHashes)
        .map(i => s"((h1 + $i*h2) % $SeedMod) % $MBits AS p$i")
        .mkString(",\n    ")
      val inBloom = (0 until KHashes)
        .map(i => s"p$i IN (SELECT p FROM bloom)")
        .mkString("\n      AND ")
      s"""${TextDedup.ShingleCte},
         |ps AS (SELECT doc_id, h1,
         |    $posSel
         |  FROM sh),
         |bloom AS (SELECT DISTINCT unnest([p0, p1, p2, p3]) AS p
         |  FROM ps WHERE doc_id % 50 = 0),
         |bench AS (SELECT DISTINCT h1 FROM sh WHERE doc_id % 50 = 0),
         |probe AS (SELECT doc_id, h1,
         |    CASE WHEN $inBloom
         |      THEN 1 ELSE 0 END AS fl
         |  FROM ps WHERE doc_id % 50 <> 0)
         |SELECT pr.doc_id,
         |  CAST(sum(pr.fl) AS BIGINT) AS n_flagged,
         |  CAST(count(b.h1) AS BIGINT) AS n_true,
         |  CAST(sum(pr.fl) - count(b.h1) AS BIGINT) AS n_fp
         |FROM probe pr LEFT JOIN bench b ON pr.h1 = b.h1
         |GROUP BY pr.doc_id
         |HAVING sum(pr.fl) > 0
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val sh = TextDedup.shingleRows(s, dir)
      val bench = sh.filter(col("doc_id") % 50 === 0)
        .select(col("h1"), col("h2")).distinct()
      val words = buildWords(bench)
      val benchH = bench.select(col("h1")).distinct()
        .withColumn("bhit", lit(1L))
      screen(sh.filter(col("doc_id") % 50 =!= 0), words)
        .join(broadcast(benchH), Seq("h1"), "left")
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
          sum(coalesce(col("bhit"), lit(0L))).as("n_true"))
        .filter(col("n_flagged") > 0)
        .select(col("doc_id"), col("n_flagged"), col("n_true"),
          (col("n_flagged") - col("n_true")).as("n_fp"))
        .orderBy(col("doc_id"))
    }
  )
}
