package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[JpegArith]] (SOF9 sequential arithmetic decode) validated the only
  * way this sandbox permits (FIXTURES.md "arithmetic fixtures"): fixture
  * streams come from the [[JpegArithEnc]] mirror encoder over KNOWN
  * quantized coefficients, and the decode must reproduce — byte-exactly —
  * the pixels the repo's Huffman-path reconstruction (same dequant, same
  * IDCT, same plane assembly) produces from those coefficients. A defect
  * anywhere in the entropy layer (QM coder, DC/AC statistical models,
  * conditioning, restarts, byte stuffing) changes decoded coefficients
  * and breaks pixel equality; a defect in the shared reconstruction
  * cannot hide because that path is already pinned against the JDK's
  * libjpeg decoder in JpegCodecSpec. Coefficients are adversarial:
  * magnitude-category boundaries, all-zero blocks, full blocks, extreme
  * DC swings. The progressive twin lives in JpegArithProgSpec. */
class JpegArithSpec extends AnyFunSuite {

  import JpegArithFixtures._

  private def seqStream(w: Int, h: Int, compHV: Array[Int],
      qtNat: Array[Array[Int]], compQ: Array[Int],
      blocks: Array[Array[Array[Array[Int]]]],
      restartInterval: Int = 0): Array[Byte] =
    JpegArithEnc.encode(w, h, compHV, qtNat, compQ, blocks,
      Seq(JpegArithEnc.Scan(compHV.indices, 0, 63, 0, 0)),
      restartInterval = restartInterval)

  test("gray 1-MCU and multi-MCU: arithmetic decode == reference reconstruction") {
    for ((w, h, seed) <- Seq((8, 8, 1), (32, 24, 2), (64, 48, 3))) {
      val hv = Array(0x11)
      val blocks = randomBlocks(seed, 1, Array(h / 8), Array(w / 8))
      val bytes = seqStream(w, h, hv, Array(flatQ), Array(0), blocks)
      val got = JpegArith.decode(bytes)
      val want = reconstruct(w, h, hv, Array(flatQ), Array(0), blocks)
      assert(got.width === w && got.height === h && got.ncomp === 1)
      assert(got.pixels.toSeq === want.pixels.toSeq, s"${w}x$h seed $seed")
    }
  }

  test("non-trivial quant table round-trips through DQT (zigzag layout)") {
    val (w, h) = (24, 16)
    val blocks = randomBlocks(7, 1, Array(2), Array(3))
    val bytes = seqStream(w, h, Array(0x11), Array(stdQ), Array(0), blocks)
    val got = JpegArith.decode(bytes)
    val want = reconstruct(w, h, Array(0x11), Array(stdQ), Array(0), blocks)
    assert(got.pixels.toSeq === want.pixels.toSeq)
  }

  test("color 4:2:0 (2x2,1x1,1x1) interleaved MCUs decode exactly") {
    val (w, h) = (32, 32)
    val hv = Array(0x22, 0x11, 0x11)
    val blocks = randomBlocks(11, 3, Array(4, 2, 2), Array(4, 2, 2))
    val q = Array(flatQ, stdQ)
    val cq = Array(0, 1, 1)
    val bytes = seqStream(w, h, hv, q, cq, blocks)
    val got = JpegArith.decode(bytes)
    val want = reconstruct(w, h, hv, q, cq, blocks)
    assert(got.ncomp === 3)
    assert(got.pixels.toSeq === want.pixels.toSeq)
  }

  test("restart intervals reset coder, statistics, and DC predictors") {
    val (w, h) = (64, 16)
    val blocks = randomBlocks(13, 1, Array(2), Array(8))
    val bytes = seqStream(w, h, Array(0x11), Array(flatQ), Array(0),
      blocks, restartInterval = 3)
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7), "no RSTn marker emitted")
    val got = JpegArith.decode(bytes)
    val want = reconstruct(w, h, Array(0x11), Array(flatQ), Array(0), blocks)
    assert(got.pixels.toSeq === want.pixels.toSeq)
  }

  test("non-default DAC conditioning (L=1, U=3, Kx=20) decodes exactly") {
    val (w, h) = (40, 24)
    val blocks = randomBlocks(17, 1, Array(3), Array(5))
    val bytes = JpegArithEnc.encode(w, h, Array(0x11), Array(stdQ), Array(0),
      blocks, Seq(JpegArithEnc.Scan(Seq(0), 0, 63, 0, 0)),
      dcL = Array.fill(4)(1), dcU = Array.fill(4)(3),
      acKx = Array.fill(4)(20), emitDac = true)
    val got = JpegArith.decode(bytes)
    val want = reconstruct(w, h, Array(0x11), Array(stdQ), Array(0), blocks)
    assert(got.pixels.toSeq === want.pixels.toSeq)
  }

  test("JpegCodec.decode routes SOF9 to the arithmetic machine") {
    val blocks = randomBlocks(19, 1, Array(1), Array(1))
    val bytes = seqStream(8, 8, Array(0x11), Array(flatQ), Array(0), blocks)
    assert(JpegCodec.decode(bytes).pixels.toSeq ===
      JpegArith.decode(bytes).pixels.toSeq)
    // flipping the SOF marker to SOF10 makes this a MALFORMED progressive
    // stream (a full-band Ss=0..63 scan violates G.1) — a named error,
    // not a silent misdecode
    val prog = bytes.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc9).get
    prog(sofAt + 1) = 0xca.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decode(prog))
    assert(e.getMessage.contains("spectral band"))
  }

  test("compression sanity: natural-statistics blocks beat 1 byte/coefficient") {
    val rng = new scala.util.Random(23)
    val blocks = Array.tabulate(1, 8, 8) { (_, _, _) =>
      val z = new Array[Int](64)
      z(0) = 100 + rng.nextInt(20)
      (1 until 8).foreach(k => z(k) = rng.nextInt(5) - 2)
      z
    }
    val bytes = seqStream(64, 64, Array(0x11), Array(flatQ), Array(0), blocks)
    assert(bytes.length < 64 * 64, s"${bytes.length} bytes for a smooth 64x64")
  }
}

/** Shared fixture helpers for the sequential and progressive arithmetic
  * specs: the reference reconstruction (no entropy layer at all) and the
  * adversarial coefficient generator. */
object JpegArithFixtures {

  /** Reference: the entropy-free rendering of the same quantized
    * coefficients ([[JpegArithEnc.render]] — dequant, IDCT, plane
    * assembly; shared with the q298 audit query). */
  def reconstruct(w: Int, h: Int, compHV: Array[Int],
      qtNat: Array[Array[Int]], compQ: Array[Int],
      blocks: Array[Array[Array[Array[Int]]]]): JpegCodec.Decoded =
    JpegArithEnc.render(w, h, compHV, qtNat, compQ, blocks)

  /** Adversarial coefficient generator: hits every magnitude-category
    * boundary (±1, ±2, ±3, ±4, ±(2^k), ±(2^k−1)), zero runs, all-zero
    * blocks, dense blocks, and large DC swings in both directions. */
  def randomBlocks(seed: Int, nc: Int, rows: Array[Int],
      cols: Array[Int]): Array[Array[Array[Array[Int]]]] = {
    val rng = new scala.util.Random(seed)
    val boundary = Array(1, 2, 3, 4, 7, 8, 15, 16, 31, 33, 127, 128, 255,
      1023, 1024, 4095)
    Array.tabulate(nc) { c =>
      Array.tabulate(rows(c)) { _ =>
        Array.tabulate(cols(c)) { _ =>
          val z = new Array[Int](64)
          rng.nextInt(5) match {
            case 0 => // all zero (EOB at k=1, zero DC diff chains)
            case 1 => // sparse with boundary magnitudes
              (0 until 4).foreach { _ =>
                val k = 1 + rng.nextInt(63)
                val v = boundary(rng.nextInt(boundary.length))
                z(k) = if (rng.nextBoolean()) v else -v
              }
            case 2 => // dense block (no EOB emitted)
              (1 until 64).foreach(k => z(k) = rng.nextInt(21) - 10)
            case 3 => // long zero run then one tail coefficient
              z(63) = boundary(rng.nextInt(boundary.length))
            case _ =>
              (0 until 10).foreach { _ =>
                z(1 + rng.nextInt(63)) = rng.nextInt(2001) - 1000
              }
          }
          z(0) = rng.nextInt(4001) - 2000 // DC value (diffs swing hard)
          z
        }
      }
    }
  }

  val flatQ: Array[Int] = Array.fill(64)(1)
  val stdQ: Array[Int] = Array.tabulate(64)(i => 1 + (i * 2) % 31)
}
