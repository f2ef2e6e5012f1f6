package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sample-level audio path: the RIFF container must round-trip PCM16
  * losslessly through javax.sound (the decode q144 actually runs), the
  * features must match their integer definitions bit-for-bit, and the
  * corpus query must equal the closed-form formula — proving the WAV
  * encode/decode added nothing. */
class AudioOpsSpec extends SparkSpec {

  test("WAV encode → javax.sound decode is a lossless PCM16 round-trip") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 64, 1024)) {
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val wav = Multimodal.wavBytes(8000, 16, 1, AudioOps.pcm16Body(samples))
      assert(AudioOps.wavDecodePcm16(wav) === samples, s"mismatch at n=$n")
    }
  }

  test("frame energies and features match their integer definitions") {
    // frame 0 loud ramp, frame 1 exact silence, frames 2+ constant mid
    val samples = Array.tabulate(AudioOps.NSamples) { i =>
      val f = i / AudioOps.FrameLen
      if (f == 0) i * 10 else if (f == 1) 0 else 500
    }
    val e = AudioOps.frameEnergies(samples)
    assert(e(0) === (0 until 64).map(i => (i * 10L) * (i * 10L)).sum)
    assert(e(1) === 0L)
    assert(e(2) === 64L * 500 * 500)
    val (fp, sil, tot) = AudioOps.features(e)
    // rises: only frame1 -> frame2 (bit 1); frame0 (e=846720) > frame2
    // (e=16e6)? no: 846720 < 16000000, so bit 0 NOT set (e0 < e1 false:
    // e1 = 0); bit 0 = e(0) < e(1) = false; bit 1 = 0 < 16e6 = true
    assert((fp & 1L) === 0L)
    assert(((fp >> 1) & 1L) === 1L)
    assert(((fp >> 2) & 1L) === 0L, "constant frames 2.. have equal energies")
    assert(sil === 1L, "exactly the zero frame is silent")
    assert(tot === e.sum)
  }

  test("pcmClip: spaces are exact silence modulo dither; full-length resample") {
    val clip = AudioOps.pcmClip("     ")
    assert(clip.zipWithIndex.forall { case (s, i) => s === i % AudioOps.FrameLen })
    // a 26-letter pangram-ish text yields samples over the letter range
    val c2 = AudioOps.pcmClip("abcdefghijklmnopqrstuvwxyz")
    assert(c2.max > 20 * AudioOps.Gain && c2.min >= AudioOps.Gain)
  }

  test("fingerprint64 packs fine-frame gradient bits little-endian, hi f<32") {
    // rising staircase energies → every gradient bit set: hi all-32-bits,
    // lo the remaining 31 (bit 63 always 0)
    val rising = Array.tabulate(AudioOps.NFineFrames)(f => f.toLong)
    assert(AudioOps.fingerprint64(rising) === ((0xffffffffL, 0x7fffffffL)))
    // single rise at the hi/lo boundary: e(31) < e(32) → hi bit 31 only
    val step = Array.tabulate(AudioOps.NFineFrames)(f => if (f >= 32) 5L else 1L)
    assert(AudioOps.fingerprint64(step) === ((1L << 31, 0L)))
  }

  test("q145: top-25 nearest banded pairs over the codec-derived fingerprint") {
    val hashes = AudioOps.fingerprintFrame(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference list computed independently: candidates = share >= 1 band
    def bands(hi: Long, lo: Long): Seq[(Int, Long)] =
      (0 until 8).map(y => y -> (if (y < 4) (hi >> (8 * y)) & 255 else (lo >> (8 * (y - 4))) & 255))
    val expected = (for {
      a <- hashes; b <- hashes
      if a._1 < b._1
      if bands(a._2, a._3).intersect(bands(b._2, b._3)).nonEmpty
    } yield (a._1, b._1,
      (java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)).toLong))
      .sortBy { case (da, db, d) => (d, da, db) }
      .take(25)
    val got = graft.SparkEntry.queries("q145_audio_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty)
    // fingerprints match the closed-form derivation for a sample of docs
    val texts = graft.schema.Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val hashMap = hashes.map(h => h._1 -> (h._2, h._3)).toMap
    texts.foreach { case (id, text) =>
      val exp = AudioOps.fingerprint64(
        AudioOps.fineEnergies(AudioOps.pcmClip(text)))
      assert(hashMap(id) === exp, s"fingerprint mismatch for doc $id")
    }
    graft.ops.CacheRegistry.release(spark, "q145-audiofp:")
  }

  test("q144 equals the closed-form formula (WAV round-trip adds nothing)") {
    val got = graft.SparkEntry.queries("q144_audio_features")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val texts = graft.schema.Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.size === texts.length)
    texts.foreach { case (id, text) =>
      val expected =
        AudioOps.features(AudioOps.frameEnergies(AudioOps.pcmClip(text)))
      assert(got(id) === expected, s"feature mismatch for doc $id")
    }
    // fingerprints discriminate — the corpus must not collapse
    assert(got.values.map(_._1).toSet.size > texts.length / 4)
  }
}
