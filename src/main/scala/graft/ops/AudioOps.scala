package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** Sample-level audio operators — the PCM half of the multimodal story,
  * closing the audio frame-level gap the way [[ImageOps]] closed the
  * image one. No external codec is needed: WAV/PCM is uncompressed, so
  * [[Multimodal.wavBytes]] emits a real RIFF container and
  * `javax.sound.sampled.AudioSystem` (in the JDK) decodes it back.
  *
  * The pipeline is the production shape for audio feature extraction at
  * 100 TB: binary WAV column → decode to samples (per-partition map,
  * codec seam) → fixed-frame energies → per-clip features (energy
  * fingerprint, silence profile). Everything downstream of the decode is
  * a narrow per-doc row — the corpus shuffles (doc_id, 4 longs), never
  * samples.
  *
  * Correctness is strict end-to-end through the codec: the synthesized
  * clip's samples are a closed-form function of the document text
  * (char codes linearly resampled over the full length, scaled around
  * the space code so an all-space stretch IS digital silence), so the
  * DuckDB oracle computes identical frame energies from the formula
  * while Spark synthesizes PCM, encodes a real 44-byte-header WAV,
  * decodes it with javax.sound, and derives the features from the
  * DECODED samples. PCM16 is lossless, so any header, endianness, or
  * sign defect anywhere in the path breaks the hash match.
  *
  * The energy fingerprint is the audio analog of q142's dHash: bit f
  * compares adjacent frame energies, so it is invariant to uniform gain
  * (any per-clip scale factor multiplies every energy by the same
  * constant) — the property real audio fingerprints (Haitsma–Kalker
  * style energy-band signs) are built on. Its 15 bits feed the same
  * Hamming-banded candidate engine q143 demonstrates; at corpus scale
  * you widen frames/bands, not the join shape.
  */
object AudioOps {

  /** Clip geometry: 1024 samples, 16 frames × 64 samples. */
  private[ops] val NSamples = 1024
  private[ops] val FrameLen = 64
  private[ops] val NFrames = NSamples / FrameLen
  /** Sample = (char − 32) · 180: spaces are EXACT zero (silence), 'z'
    * reaches 16200 — comfortably inside Int16. The + (i mod 64) dither
    * keeps constant-char frames from degenerate zero gradients. */
  private[ops] val Gain = 180
  /** A frame counts as silent below avg |s| ≈ 360 — only reachable by a
    * (near-)all-space stretch of text. */
  private[ops] val SilenceEnergy = 64L * 360 * 360

  // ------------------------------------------------------------- synth

  /** Deterministic PCM16 clip from a document's text: sample i reads the
    * [a-z ]-sanitized lowercase text at floor(i·L/1024) (the same
    * whole-document linear resample as [[ImageOps.pixelGrid]], for the
    * same blocking-distribution reason), centered on the space code.
    * Empty text → pure silence plus the dither ramp. */
  private[ops] def pcmClip(text: String): Array[Int] = {
    val cleaned = Option(text).getOrElse("")
      .toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z ]", "")
    Array.tabulate(NSamples) { i =>
      val c = if (cleaned.isEmpty) 32
        else cleaned.charAt((i.toLong * cleaned.length / NSamples).toInt).toInt
      (c - 32) * Gain + (i % FrameLen)
    }
  }

  // ------------------------------------------------- WAV encode/decode

  /** Little-endian PCM16 body for [[Multimodal.wavBytes]]. */
  def pcm16Body(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decode a WAV through the JDK's real audio stack — format sanity
    * (PCM, 16-bit, mono) is asserted from the parsed header, then the
    * frame stream is drained and reassembled into signed samples. */
  def wavDecodePcm16(bytes: Array[Byte]): Array[Int] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    // endianness matters: AudioSystem also parses AIFF/AU, whose PCM is
    // big-endian — those must trip the guard, not silently byte-swap
    require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
      && !fmt.isBigEndian,
      s"unexpected audio format: $fmt")
    val raw = in.readAllBytes()
    in.close()
    val n = raw.length / 2
    Array.tabulate(n) { i =>
      ((raw(2 * i) & 0xff) | (raw(2 * i + 1).toInt << 8)).toShort.toInt
    }
  }

  // ----------------------------------------------------------- features

  /** Per-frame energies Σ s² — the basis of every derived feature. */
  private def energies(samples: Array[Int], frameLen: Int): Array[Long] =
    Array.tabulate(samples.length / frameLen) { f =>
      var e = 0L
      var i = 0
      while (i < frameLen) {
        val s = samples(f * frameLen + i).toLong
        e += s * s
        i += 1
      }
      e
    }

  private[ops] def frameEnergies(samples: Array[Int]): Array[Long] =
    energies(samples, FrameLen)

  /** (fingerprint, silent frame count, total energy): bit f of the
    * fingerprint is e(f) < e(f+1), packed little-endian — 15 bits. */
  private[ops] def features(e: Array[Long]): (Long, Long, Long) = {
    var fp = 0L
    var f = 0
    while (f < NFrames - 1) {
      if (e(f) < e(f + 1)) fp |= (1L << f)
      f += 1
    }
    (fp, e.count(_ < SilenceEnergy).toLong, e.sum)
  }

  // ------------------------------------------- 64-bit fingerprint (q145)

  /** Fine-frame geometry for the NEAR-DUP fingerprint: the same 1024
    * decoded samples cut into 64 frames of 16 → 63 adjacent-energy
    * comparisons — enough bits for the q143 banding engine (8 bands of 8;
    * bit 63 stays 0, which only fixes one position of band 7). */
  private[ops] val FineFrameLen = 16
  private[ops] val NFineFrames = NSamples / FineFrameLen

  private[ops] def fineEnergies(samples: Array[Int]): Array[Long] =
    energies(samples, FineFrameLen)

  /** (hi, lo): bit f of the 63-bit fingerprint is e(f) < e(f+1), packed
    * little-endian — f 0–31 in hi, 32–62 in lo. The Haitsma–Kalker shape:
    * energy-gradient signs, invariant under uniform gain. */
  private[ops] def fingerprint64(e: Array[Long]): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var f = 0
    while (f < NFineFrames - 1) {
      if (e(f) < e(f + 1)) {
        if (f < 32) hi |= (1L << f) else lo |= (1L << (f - 32))
      }
      f += 1
    }
    (hi, lo)
  }

  /** (doc_id, dhash_hi, dhash_lo) — the fingerprint frame in the exact
    * column shape [[ImageOps.neardupPairs]] consumes, through the full
    * codec path. Registry-cached per (session, dir). */
  private[graft] def fingerprintFrame(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    CacheRegistry.cache(s, s"q145-audiofp:$dir") {
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val wav = Multimodal.wavBytes(8000, 16, 1, pcm16Body(pcmClip(text)))
          val (hi, lo) = fingerprint64(fineEnergies(wavDecodePcm16(wav)))
          (id, hi, lo)
        })
        .toDF("doc_id", "dhash_hi", "dhash_lo")
    }

  // --------------------------------------------------------- queries

  private val OracleSmpCte: String =
    s"""WITH px AS (SELECT doc_id,
       |    regexp_replace(lower(coalesce(text, '')), '[^a-z ]', '', 'g') AS ctext
       |  FROM documents),
       |smp AS (SELECT doc_id, u.i,
       |    CAST((CASE WHEN len(ctext) > 0
       |          THEN unicode(substr(ctext,
       |                 CAST((u.i * len(ctext)) // $NSamples AS BIGINT) + 1, 1))
       |          ELSE 32 END - 32) * $Gain + (u.i % $FrameLen) AS BIGINT) AS s
       |  FROM px, unnest(range(0, $NSamples)) u(i))""".stripMargin

  private val OracleFrameCte: String =
    s"""$OracleSmpCte,
       |fr AS (SELECT doc_id, i // $FrameLen AS f, CAST(sum(s * s) AS BIGINT) AS e
       |  FROM smp GROUP BY doc_id, i // $FrameLen)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- frame-level audio features through a real codec round-trip ----
    // Spark synthesizes PCM, encodes a real RIFF/WAV container, decodes
    // it back with javax.sound.sampled, and reduces the DECODED samples
    // to (fingerprint, silence profile, energy); the oracle computes the
    // same integers from the closed-form sample formula. Lossless PCM ⇒
    // strict equality end-to-end through the codec path.
    Q("q144_audio_features",
      s"""$OracleFrameCte,
         |fp AS (SELECT l.doc_id,
         |    CAST(sum(CASE WHEN l.e < r.e THEN 1 << l.f ELSE 0 END) AS BIGINT) AS fingerprint
         |  FROM fr l JOIN fr r ON l.doc_id = r.doc_id AND r.f = l.f + 1
         |  GROUP BY l.doc_id),
         |agg AS (SELECT doc_id,
         |    CAST(sum(CASE WHEN e < $SilenceEnergy THEN 1 ELSE 0 END) AS BIGINT) AS silence_frames,
         |    CAST(sum(e) AS BIGINT) AS total_energy
         |  FROM fr GROUP BY doc_id)
         |SELECT agg.doc_id, fp.fingerprint, agg.silence_frames, agg.total_energy
         |FROM agg JOIN fp ON agg.doc_id = fp.doc_id
         |ORDER BY agg.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          // codec-per-partition seam, as in ImageOps.dhashFrame
          it.map { case (id, text) =>
            val wav = Multimodal.wavBytes(8000, 16, 1, pcm16Body(pcmClip(text)))
            val decoded = wavDecodePcm16(wav)
            require(decoded.length == NSamples, s"decode length ${decoded.length}")
            val (fp, sil, tot) = features(frameEnergies(decoded))
            (id, fp, sil, tot)
          }
        }
        .toDF("doc_id", "fingerprint", "silence_frames", "total_energy")
        .orderBy(col("doc_id"))
    },

    // ---- audio near-dup: the q143 banding engine on the fingerprint ----
    // q144's coarse 15-bit fingerprint profiles a clip; near-dup needs
    // more selectivity, so the same decoded samples are cut into 64 fine
    // frames → a 63-bit Haitsma–Kalker-shaped gradient fingerprint that
    // feeds ImageOps.neardupPairs UNCHANGED (distinct-hash collapse,
    // bounded band space, df cap, probe-side increments — one engine, two
    // modalities). Top-25 nearest candidate pairs; pigeonhole covers
    // every d ≤ 7 pair as in q143.
    Q("q145_audio_neardup",
      s"""$OracleSmpCte,
         |fr AS (SELECT doc_id, i // $FineFrameLen AS f,
         |    CAST(sum(s * s) AS BIGINT) AS e
         |  FROM smp GROUP BY doc_id, i // $FineFrameLen),
         |fp AS (SELECT l.doc_id,
         |    CAST(sum(CASE WHEN l.f < 32 AND l.e < r.e
         |             THEN CAST(1 AS BIGINT) << l.f ELSE 0 END) AS BIGINT) AS hi,
         |    CAST(sum(CASE WHEN l.f >= 32 AND l.e < r.e
         |             THEN CAST(1 AS BIGINT) << (l.f - 32) ELSE 0 END) AS BIGINT) AS lo
         |  FROM fr l JOIN fr r ON l.doc_id = r.doc_id AND r.f = l.f + 1
         |  GROUP BY l.doc_id),
         |bd AS (SELECT doc_id, t.y,
         |    CASE WHEN t.y < 4 THEN (hi >> (8 * t.y)) & 255
         |         ELSE (lo >> (8 * (t.y - 4))) & 255 END AS rb
         |  FROM fp, range(0, 8) t(y)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bd a JOIN bd b ON a.y = b.y AND a.rb = b.rb
         |    AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |    CAST(bit_count(xor(fa.hi, fb.hi))
         |      + bit_count(xor(fa.lo, fb.lo)) AS BIGINT) AS hamming
         |FROM cand
         |JOIN fp fa ON doc_a = fa.doc_id
         |JOIN fp fb ON doc_b = fb.doc_id
         |ORDER BY hamming, doc_a, doc_b
         |LIMIT 25""".stripMargin) { (s, dir) =>
      val maxBandDf =
        s.conf.getOption("graft.imagedup.maxBandDf").map(_.toLong).getOrElse(0L)
      ImageOps.neardupPairs(fingerprintFrame(s, dir), maxBandDf)
        .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
        .limit(25)
    }
  )
}
