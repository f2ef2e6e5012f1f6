package graft.ops

import JpegCodec.{Decoded, u16, parseDqt, ZigZag, idct, assemble}

/** Sequential arithmetic-coded JPEG (SOF9) — T.81 Annex F.1.4.4's
  * statistical models over the [[QmCoder]] entropy layer, filling the
  * codec boundary VERDICT r13 item 3 names (the repo previously decoded
  * baseline/extended/progressive Huffman only).
  *
  * The statistical conditioning follows F.1.4.4.1 (DC) and F.1.4.4.2
  * (AC) exactly as specified:
  *
  *  - DC: 64 context bins per conditioning table. Bins 0..19 hold five
  *    4-bin groups selected by the classification of the PREVIOUS diff
  *    against the (L, U) conditioning bounds from the DAC marker
  *    (default L=0, U=1): zero / small± / large±. Group layout:
  *    +0 "is the diff nonzero", +1 sign, +2/+3 "magnitude > 1" given
  *    +/−. Magnitude-category bins (X) sit at 20.., mantissa bins 14
  *    above the bin where the category walk stopped.
  *  - AC: 256 bins per table. 3 bins per coefficient index k: 3(k−1)+0
  *    end-of-block, +1 "coefficient nonzero", +2 "magnitude > 1" twice
  *    (the second decision at the same bin selects category ≥ 2).
  *    Shared X/M bins at 189 (k ≤ Kx, DAC-conditioned, default 5) or
  *    217 (high spectrum). The SIGN is coded in the non-adaptive ~0.5
  *    bin — sign carries no exploitable bias in DCT coefficients.
  *  - Statistics, DC predictors, and the coder itself reset at restart
  *    markers (found by scanning for 0xFF + byte ≥ 0x80, which entropy
  *    data cannot contain thanks to bit stuffing).
  *
  * Fixture validation strategy (no third-party arithmetic-JPEG codec
  * exists in this sandbox — FIXTURES.md): JpegArithSpec encodes known
  * quantized coefficients with the test-side mirror encoder and pins (a)
  * pixel equality against the Huffman-path reconstruction of the same
  * coefficients through the same IDCT/assemble, (b) QM round-trip
  * exactness, (c) DAC/restart handling, (d) compressed size sanity. */
object JpegArith {

  /** Decode a sequential arithmetic JPEG (SOI .. SOF9 .. SOS .. EOI). */
  def decode(data: Array[Byte]): Decoded = {
    require(data.length > 4 && (data(0) & 0xff) == 0xff &&
      (data(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    val qt = new Array[Array[Int]](4)
    // DAC conditioning, T.81 defaults
    val dcL = Array.fill(4)(0)
    val dcU = Array.fill(4)(1)
    val acKx = Array.fill(4)(5)
    var restartInterval = 0
    var w = 0; var h = 0
    var nc = 0
    var compId: Array[Int] = null
    var compHV: Array[Int] = null
    var compQ: Array[Int] = null
    var p = 2
    var sosAt = -1
    var scanComp: Array[Int] = null
    var scanDcT: Array[Int] = null
    var scanAcT: Array[Int] = null
    while (sosAt < 0) {
      require(p + 2 <= data.length, "truncated JPEG before SOS")
      require((data(p) & 0xff) == 0xff, f"expected marker at $p")
      while (p + 2 < data.length && (data(p + 1) & 0xff) == 0xff) p += 1
      val m = data(p + 1) & 0xff
      require(m != 0xd9, "EOI before SOS — stream carries no image scan")
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { p += 2 }
      else if (p + 4 > data.length) {
        throw new IllegalArgumentException("truncated JPEG before SOS")
      } else {
        val len = u16(data, p + 2)
        val seg = p + 4
        m match {
          case 0xdb => parseDqt(data, seg, len, qt)
          case 0xcc => // DAC: (class/id byte, value byte) pairs
            var q = seg
            while (q < seg + len - 2) {
              val tc = (data(q) & 0xff) >> 4
              val tb = data(q) & 0x0f
              val v = data(q + 1) & 0xff
              require(tb < 4, s"DAC table id $tb out of range")
              if (tc == 0) { // DC conditioning: value = (U << 4) | L
                dcL(tb) = v & 0x0f
                dcU(tb) = v >> 4
                require(dcL(tb) <= dcU(tb) && dcU(tb) <= 15,
                  s"DAC DC bounds L=${dcL(tb)} U=${dcU(tb)} invalid")
              } else { // AC conditioning: value = Kx
                require(v >= 1 && v <= 63, s"DAC AC Kx=$v outside [1,63]")
                acKx(tb) = v
              }
              q += 2
            }
          case 0xc9 => // SOF9: sequential arithmetic
            require((data(seg) & 0xff) == 8, "only 8-bit precision supported")
            h = u16(data, seg + 1); w = u16(data, seg + 3)
            nc = data(seg + 5) & 0xff
            require(nc == 1 || nc == 3,
              s"unsupported component count $nc (gray or YCbCr only)")
            compId = new Array[Int](nc); compHV = new Array[Int](nc)
            compQ = new Array[Int](nc)
            var i = 0
            while (i < nc) {
              compId(i) = data(seg + 6 + 3 * i) & 0xff
              compHV(i) = data(seg + 7 + 3 * i) & 0xff
              compQ(i) = data(seg + 8 + 3 * i) & 0xff
              i += 1
            }
          case 0xca =>
            throw new UnsupportedOperationException(
              "progressive arithmetic (SOF10) not supported — sequential" +
                " arithmetic (SOF9) only")
          case 0xdd => restartInterval = u16(data, seg)
          case 0xda =>
            val ns = data(seg) & 0xff
            require(ns == nc, s"scan components $ns != frame components $nc")
            scanComp = new Array[Int](ns)
            scanDcT = new Array[Int](ns); scanAcT = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = data(seg + 1 + 2 * i) & 0xff
              val idx = compId.indexOf(cid)
              require(idx >= 0, s"scan references unknown component $cid")
              scanComp(i) = idx
              scanDcT(i) = (data(seg + 2 + 2 * i) & 0xff) >> 4
              scanAcT(i) = data(seg + 2 + 2 * i) & 0x0f
              i += 1
            }
            sosAt = seg + len - 2
          case _ => // APPn, COM, DHT (unused), … — skip
        }
        if (sosAt < 0) p += 2 + len
      }
    }
    require(w > 0 && h > 0, "missing SOF9 before SOS")

    val hMax = compHV.map(_ >> 4).max
    val vMax = compHV.map(_ & 0x0f).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = (0 until nc).map(c => mcusX * (compHV(c) >> 4) * 8).toArray
    val planeH = (0 until nc).map(c => mcusY * (compHV(c) & 0x0f) * 8).toArray
    val planes = (0 until nc).map(c => new Array[Int](planeW(c) * planeH(c))).toArray

    var dcBins: Array[Array[Int]] = null
    var acBins: Array[Array[Int]] = null
    val dcPred = new Array[Int](nc)
    val dcCtx = new Array[Int](nc) // 0 / 4 / 8 / 12 / 16
    var dec: QmCoder.Decoder = null
    def resetScanState(at: Int): Unit = {
      dcBins = Array.fill(4)(new Array[Int](64))
      acBins = Array.fill(4)(new Array[Int](256))
      java.util.Arrays.fill(dcPred, 0)
      java.util.Arrays.fill(dcCtx, 0)
      dec = new QmCoder.Decoder(data, at)
    }
    resetScanState(sosAt)
    // the one non-adaptive bin (AC sign): a dedicated single-slot array
    val signBin = Array(QmCoder.fixedBin)

    val coef = new Array[Int](64)
    val blk = new Array[Int](64)

    def decodeBlock(c: Int, dcT: Int, acT: Int): Unit = {
      java.util.Arrays.fill(coef, 0)
      val db = dcBins(dcT)
      val base = dcCtx(c)
      var diff = 0
      if (dec.decode(db, base) == 0) dcCtx(c) = 0
      else {
        val sign = dec.decode(db, base + 1)
        var m = dec.decode(db, base + 2 + sign)
        var st = base + 2 + sign
        if (m != 0) {
          st = 20
          while (dec.decode(db, st) != 0) {
            m <<= 1
            require(m != 0x8000, "DC magnitude category overflow")
            st += 1
          }
        }
        // classify THIS diff's category for the next block's context
        dcCtx(c) =
          if (m < ((1 << dcL(dcT)) >> 1)) 0
          else if (m > ((1 << dcU(dcT)) >> 1)) 12 + 4 * sign
          else 4 + 4 * sign
        var v = m
        st += 14
        m >>= 1
        while (m != 0) {
          if (dec.decode(db, st) != 0) v |= m
          m >>= 1
        }
        diff = v + 1
        if (sign != 0) diff = -diff
      }
      dcPred(c) += diff
      coef(0) = dcPred(c)

      val ab = acBins(acT)
      val kx = acKx(acT)
      var k = 1
      var eob = false
      while (k <= 63 && !eob) {
        var st = 3 * (k - 1)
        if (dec.decode(ab, st) != 0) eob = true
        else {
          while (dec.decode(ab, st + 1) == 0) {
            k += 1
            st += 3
            require(k <= 63, "AC zero run past end of block")
          }
          val sign = dec.decode(signBin, 0)
          st += 2
          var m = dec.decode(ab, st)
          if (m != 0 && dec.decode(ab, st) != 0) {
            m <<= 1
            st = if (k <= kx) 189 else 217
            while (dec.decode(ab, st) != 0) {
              m <<= 1
              require(m != 0x8000, "AC magnitude category overflow")
              st += 1
            }
          }
          var v = m
          st += 14
          m >>= 1
          while (m != 0) {
            if (dec.decode(ab, st) != 0) v |= m
            m >>= 1
          }
          v += 1
          coef(ZigZag(k)) = if (sign != 0) -v else v
          k += 1
        }
      }
    }

    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          // entropy segment over: locate RSTn (entropy bytes can never be
          // 0xFF followed by >= 0x80 — bit stuffing), then restart clean
          var q = dec.pos
          while (q + 1 < data.length &&
            !((data(q) & 0xff) == 0xff && (data(q + 1) & 0xff) >= 0x80)) q += 1
          require(q + 1 < data.length, "truncated before restart marker")
          val rm = data(q + 1) & 0xff
          require(rm >= 0xd0 && rm <= 0xd7, f"expected RSTn, got 0xff$rm%02x")
          resetScanState(q + 2)
          mcusSinceRestart = 0
        }
        var sc = 0
        while (sc < nc) {
          val c = scanComp(sc)
          val ch = compHV(c) >> 4
          val cv = compHV(c) & 0x0f
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < ch) {
              decodeBlock(c, scanDcT(sc), scanAcT(sc))
              val q = qt(compQ(c))
              require(q != null, s"missing quant table ${compQ(c)}")
              var i = 0
              while (i < 64) { coef(i) = coef(i) * q(i); i += 1 }
              idct(coef, blk)
              val px = (mx * ch + bx) * 8
              val py = (my * cv + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(c)((py + yy) * planeW(c) + px + xx) = blk(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          sc += 1
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
    }
    assemble(w, h, nc, compHV, hMax, vMax, planeW, planes)
  }
}
