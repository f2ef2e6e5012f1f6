package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[JpegArith.decodeProgressive]] (SOF10) under the same validation
  * contract as the sequential spec: mirror-encoder fixtures over known
  * coefficients, pixel-exact equality against the entropy-free
  * reconstruction. Scripts exercise every scan kind — interleaved
  * DC-first, DC refinement (fixed-bin bits on SIGNED values — the
  * arithmetic-shift point transform), non-interleaved AC band scans,
  * successive-approximation AC refinement (correction bits,
  * newly-nonzero insertions mid-band, per-block EOB state), multi-pass
  * refinement down to full precision, restarts inside a scan, and
  * subsampled color. */
class JpegArithProgSpec extends AnyFunSuite {

  import JpegArithFixtures._
  import JpegArithEnc.Scan

  /** The JDK-writer-shaped gray script: DC first at Al=1, DC refine,
    * full AC band at Al=2, then AC refinements to Al=0. */
  private def grayScript: Seq[Scan] = Seq(
    Scan(Seq(0), 0, 0, 0, 1),
    Scan(Seq(0), 1, 63, 0, 2),
    Scan(Seq(0), 0, 0, 1, 0),
    Scan(Seq(0), 1, 63, 2, 1),
    Scan(Seq(0), 1, 63, 1, 0))

  /** Split-band color script over 3 components. */
  private def colorScript(nc: Int): Seq[Scan] = {
    val dcFirst = Scan(0 until nc, 0, 0, 0, 1)
    val acFirsts = (0 until nc).flatMap(c =>
      Seq(Scan(Seq(c), 1, 5, 0, 1), Scan(Seq(c), 6, 63, 0, 1)))
    val dcRef = Scan(0 until nc, 0, 0, 1, 0)
    val acRefs = (0 until nc).map(c => Scan(Seq(c), 1, 63, 1, 0))
    (dcFirst +: acFirsts) ++ (dcRef +: acRefs)
  }

  test("gray progressive script: decode == reference reconstruction") {
    for ((w, h, seed) <- Seq((8, 8, 31), (32, 24, 37), (64, 48, 41))) {
      val blocks = randomBlocks(seed, 1, Array(h / 8), Array(w / 8))
      val bytes = JpegArithEnc.encode(w, h, Array(0x11), Array(stdQ),
        Array(0), blocks, grayScript)
      val got = JpegArith.decodeProgressive(bytes)
      val want = reconstruct(w, h, Array(0x11), Array(stdQ), Array(0), blocks)
      assert(got.width === w && got.height === h)
      assert(got.pixels.toSeq === want.pixels.toSeq, s"${w}x$h seed $seed")
    }
  }

  test("JpegCodec.decode routes SOF10 to the progressive arithmetic machine") {
    val blocks = randomBlocks(43, 1, Array(2), Array(2))
    val bytes = JpegArithEnc.encode(16, 16, Array(0x11), Array(flatQ),
      Array(0), blocks, grayScript)
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xca), "stream is not SOF10")
    assert(JpegCodec.decode(bytes).pixels.toSeq ===
      JpegArith.decodeProgressive(bytes).pixels.toSeq)
  }

  test("color 4:2:0 with split AC bands and refinements decodes exactly") {
    val (w, h) = (32, 32)
    val hv = Array(0x22, 0x11, 0x11)
    val blocks = randomBlocks(47, 3, Array(4, 2, 2), Array(4, 2, 2))
    val q = Array(flatQ, stdQ)
    val cq = Array(0, 1, 1)
    val bytes = JpegArithEnc.encode(w, h, hv, q, cq, blocks, colorScript(3))
    val got = JpegArith.decodeProgressive(bytes)
    val want = reconstruct(w, h, hv, q, cq, blocks)
    assert(got.ncomp === 3)
    assert(got.pixels.toSeq === want.pixels.toSeq)
  }

  test("deep refinement ladder (Al=3 -> 0) reconstructs exact magnitudes") {
    // values chosen so every refinement scan carries real bits:
    // magnitudes spread across [1, 15] plus negatives and a big DC
    val z = new Array[Int](64)
    Seq(1 -> 15, 2 -> -13, 3 -> 9, 7 -> -8, 8 -> 7, 20 -> -5, 21 -> 4,
      40 -> -3, 41 -> 2, 63 -> -1).foreach { case (k, v) => z(k) = v }
    z(0) = -77
    val blocks = Array(Array(Array(z)))
    val script = Seq(
      Scan(Seq(0), 0, 0, 0, 3), Scan(Seq(0), 1, 63, 0, 3),
      Scan(Seq(0), 0, 0, 3, 2), Scan(Seq(0), 1, 63, 3, 2),
      Scan(Seq(0), 0, 0, 2, 1), Scan(Seq(0), 1, 63, 2, 1),
      Scan(Seq(0), 0, 0, 1, 0), Scan(Seq(0), 1, 63, 1, 0))
    val bytes = JpegArithEnc.encode(8, 8, Array(0x11), Array(flatQ),
      Array(0), blocks, script)
    val got = JpegArith.decodeProgressive(bytes)
    val want = reconstruct(8, 8, Array(0x11), Array(flatQ), Array(0), blocks)
    assert(got.pixels.toSeq === want.pixels.toSeq)
  }

  test("restart intervals inside progressive scans reset everything") {
    val (w, h) = (64, 16)
    val blocks = randomBlocks(53, 1, Array(2), Array(8))
    val bytes = JpegArithEnc.encode(w, h, Array(0x11), Array(flatQ),
      Array(0), blocks, grayScript, restartInterval = 3)
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7), "no RSTn emitted")
    val got = JpegArith.decodeProgressive(bytes)
    val want = reconstruct(w, h, Array(0x11), Array(flatQ), Array(0), blocks)
    assert(got.pixels.toSeq === want.pixels.toSeq)
  }

  test("sequential and progressive arithmetic agree on the same coefficients") {
    val blocks = randomBlocks(59, 1, Array(3), Array(4))
    val seqB = JpegArithEnc.encode(32, 24, Array(0x11), Array(stdQ),
      Array(0), blocks, Seq(Scan(Seq(0), 0, 63, 0, 0)))
    val proB = JpegArithEnc.encode(32, 24, Array(0x11), Array(stdQ),
      Array(0), blocks, grayScript)
    assert(JpegArith.decode(seqB).pixels.toSeq ===
      JpegArith.decodeProgressive(proB).pixels.toSeq)
  }
}
