package graft.ops

import JpegCodec.{Decoded, u16, parseDqt, ZigZag, idct, assemble}

/** Arithmetic-coded JPEG decode — T.81 Annex F.1.4.4's statistical
  * models over the [[QmCoder]] entropy layer, filling the codec boundary
  * VERDICT r13 item 3 names: SEQUENTIAL (SOF9) and, since round 14's
  * second pass, PROGRESSIVE (SOF10) with spectral selection and
  * successive approximation (the Annex G conditioning: DC refinement
  * bits and AC signs in the non-adaptive ~0.5 bin, AC-first scans on the
  * sequential AC model at the scan's point transform, AC-refinement with
  * per-coefficient correction/newly-nonzero decisions).
  *
  * The statistical conditioning follows F.1.4.4.1 (DC) and F.1.4.4.2
  * (AC):
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
  *  - Point transform: ARITHMETIC shift for DC (G.1.2.1), sign-magnitude
  *    shift for AC (G.1.2.2) — the decoder reconstructs DC as
  *    (first << Al) | refinement bits, so negatives round-trip only
  *    under the arithmetic-shift convention.
  *  - Statistics, DC predictors/contexts, and the coder itself reset at
  *    restart markers and at every scan (found by scanning for 0xFF +
  *    non-zero, which stuffed entropy data cannot contain).
  *
  * Fixture validation strategy (no third-party arithmetic-JPEG codec
  * exists in this sandbox — FIXTURES.md §C): JpegArithSpec /
  * JpegArithProgSpec encode known quantized coefficients with the
  * [[JpegArithEnc]] mirror encoder and pin (a) pixel equality against
  * the Huffman-path reconstruction of the same coefficients through the
  * same IDCT/assemble, (b) QM round-trip exactness, (c) DAC/restart
  * handling, (d) compressed-size sanity. */
object JpegArith {

  /** Per-segment model state: one arithmetic decoder plus the
    * conditioning bins, reset together at scan starts and restarts. */
  private final class Ctx(data: Array[Byte], start: Int) {
    val dec = new QmCoder.Decoder(data, start)
    val dcBins: Array[Array[Int]] = Array.fill(4)(new Array[Int](64))
    val acBins: Array[Array[Int]] = Array.fill(4)(new Array[Int](256))
    val signBin: Array[Int] = Array(QmCoder.fixedBin)
    val dcPred = new Array[Int](4)
    val dcCtx = new Array[Int](4) // 0 / 4 / 8 / 12 / 16
  }

  /** One DC difference at the current scan's precision (F.1.4.4.1),
    * updating the component's predictor and context classification. */
  private def decodeDc(mc: Ctx, c: Int, dcT: Int, dcL: Array[Int],
      dcU: Array[Int]): Int = {
    val db = mc.dcBins(dcT)
    val base = mc.dcCtx(c)
    var diff = 0
    if (mc.dec.decode(db, base) == 0) mc.dcCtx(c) = 0
    else {
      val sign = mc.dec.decode(db, base + 1)
      var m = mc.dec.decode(db, base + 2 + sign)
      var st = base + 2 + sign
      if (m != 0) {
        st = 20
        while (mc.dec.decode(db, st) != 0) {
          m <<= 1
          require(m != 0x8000, "DC magnitude category overflow")
          st += 1
        }
      }
      mc.dcCtx(c) =
        if (m < ((1 << dcL(dcT)) >> 1)) 0
        else if (m > ((1 << dcU(dcT)) >> 1)) 12 + 4 * sign
        else 4 + 4 * sign
      var v = m
      st += 14
      m >>= 1
      while (m != 0) {
        if (mc.dec.decode(db, st) != 0) v |= m
        m >>= 1
      }
      diff = v + 1
      if (sign != 0) diff = -diff
    }
    mc.dcPred(c) += diff
    mc.dcPred(c)
  }

  /** AC band [ss, se] of one block at point transform `al` (F.1.4.4.2),
    * written in ZIGZAG positions `base+k` of `outZ`. */
  private def decodeAcBand(mc: Ctx, acT: Int, acKx: Array[Int],
      outZ: Array[Int], base: Int, ss: Int, se: Int, al: Int): Unit = {
    val ab = mc.acBins(acT)
    val kx = acKx(acT)
    var k = ss
    var eob = false
    while (k <= se && !eob) {
      var st = 3 * (k - 1)
      if (mc.dec.decode(ab, st) != 0) eob = true
      else {
        while (mc.dec.decode(ab, st + 1) == 0) {
          k += 1
          st += 3
          require(k <= se, "AC zero run past end of band")
        }
        val sign = mc.dec.decode(mc.signBin, 0)
        st += 2
        var m = mc.dec.decode(ab, st)
        if (m != 0 && mc.dec.decode(ab, st) != 0) {
          m <<= 1
          st = if (k <= kx) 189 else 217
          while (mc.dec.decode(ab, st) != 0) {
            m <<= 1
            require(m != 0x8000, "AC magnitude category overflow")
            st += 1
          }
        }
        var v = m
        st += 14
        m >>= 1
        while (m != 0) {
          if (mc.dec.decode(ab, st) != 0) v |= m
          m >>= 1
        }
        v += 1
        outZ(base + k) = (if (sign != 0) -v else v) << al
        k += 1
      }
    }
  }

  /** AC refinement at (ah, al) over ZIGZAG positions `base+k` — the
    * successive-approximation correction pass (G.1.2.3 model shape). */
  private def decodeAcRefine(mc: Ctx, acT: Int, outZ: Array[Int],
      base: Int, ss: Int, se: Int, al: Int): Unit = {
    val ab = mc.acBins(acT)
    val p1 = 1 << al
    val m1 = -1 << al
    var kex = se
    while (kex >= ss && outZ(base + kex) == 0) kex -= 1
    var k = ss
    var brk = false
    while (k <= se && !brk) {
      var st = 3 * (k - 1)
      if (k > kex && mc.dec.decode(ab, st) != 0) brk = true
      if (!brk) {
        var placed = false
        while (!placed) {
          val cur = outZ(base + k)
          if (cur != 0) {
            if (mc.dec.decode(ab, st + 2) != 0)
              outZ(base + k) = cur + (if (cur >= 0) p1 else m1)
            placed = true
          } else if (mc.dec.decode(ab, st + 1) != 0) {
            outZ(base + k) = if (mc.dec.decode(mc.signBin, 0) != 0) m1 else p1
            placed = true
          } else {
            st += 3
            k += 1
            require(k <= se, "refine run past end of band")
          }
        }
        k += 1
      }
    }
  }

  /** Advance from the decoder's resting position to the next true marker
    * (entropy data can only contain 0xFF as a stuffed 0xFF00 pair). */
  private def nextMarker(data: Array[Byte], from: Int): Int = {
    var q = from
    while (q + 1 < data.length &&
      !((data(q) & 0xff) == 0xff && (data(q + 1) & 0xff) != 0x00)) q += 1
    require(q + 1 < data.length, "truncated before a terminating marker")
    q
  }

  /** Decode a sequential arithmetic JPEG (SOI .. SOF9 .. SOS .. EOI). */
  def decode(data: Array[Byte]): Decoded = {
    require(data.length > 4 && (data(0) & 0xff) == 0xff &&
      (data(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    val qt = new Array[Array[Int]](4)
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
          case 0xcc => parseDac(data, seg, len, dcL, dcU, acKx)
          case 0xc9 =>
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
          case 0xca => // SOF10: hand the stream to the progressive machine
            return decodeProgressive(data)
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
    val planes = (0 until nc).map { c =>
      new Array[Int](planeW(c) * mcusY * (compHV(c) & 0x0f) * 8)
    }.toArray

    var mc = new Ctx(data, sosAt)
    val zcoef = new Array[Int](64)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)

    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          val q = nextMarker(data, mc.dec.pos)
          val rm = data(q + 1) & 0xff
          require(rm >= 0xd0 && rm <= 0xd7, f"expected RSTn, got 0xff$rm%02x")
          mc = new Ctx(data, q + 2)
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
              java.util.Arrays.fill(zcoef, 0)
              zcoef(0) = decodeDc(mc, c, scanDcT(sc), dcL, dcU)
              decodeAcBand(mc, scanAcT(sc), acKx, zcoef, 0, 1, 63, 0)
              val q = qt(compQ(c))
              require(q != null, s"missing quant table ${compQ(c)}")
              var i = 0
              while (i < 64) {
                coef(ZigZag(i)) = zcoef(i) * q(ZigZag(i))
                i += 1
              }
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

  private def parseDac(data: Array[Byte], seg: Int, len: Int,
      dcL: Array[Int], dcU: Array[Int], acKx: Array[Int]): Unit = {
    var q = seg
    while (q < seg + len - 2) {
      val tc = (data(q) & 0xff) >> 4
      val tb = data(q) & 0x0f
      val v = data(q + 1) & 0xff
      require(tb < 4, s"DAC table id $tb out of range")
      if (tc == 0) {
        dcL(tb) = v & 0x0f
        dcU(tb) = v >> 4
        require(dcL(tb) <= dcU(tb) && dcU(tb) <= 15,
          s"DAC DC bounds L=${dcL(tb)} U=${dcU(tb)} invalid")
      } else {
        require(v >= 1 && v <= 63, s"DAC AC Kx=$v outside [1,63]")
        acKx(tb) = v
      }
      q += 2
    }
  }

  /** Decode a progressive arithmetic JPEG (SOF10): the Huffman
    * progressive machine's scan/coefficient-accumulation structure with
    * the arithmetic per-scan models above. */
  def decodeProgressive(data: Array[Byte]): Decoded = {
    val qt = new Array[Array[Int]](4)
    val dcL = Array.fill(4)(0)
    val dcU = Array.fill(4)(1)
    val acKx = Array.fill(4)(5)
    var restartInterval = 0
    var w = 0; var h = 0
    var nc = 0
    var compId: Array[Int] = null
    var compHV: Array[Int] = null
    var compQ: Array[Int] = null
    var hMax = 0; var vMax = 0
    var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null
    var coefZ: Array[Array[Int]] = null

    def processScan(sComp: Array[Int], sDcT: Array[Int], sAcT: Array[Int],
        ss: Int, se: Int, ah: Int, al: Int, startPos: Int): Int = {
      var mc = new Ctx(data, startPos)
      var sinceRestart = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          val q = nextMarker(data, mc.dec.pos)
          val rm = data(q + 1) & 0xff
          require(rm >= 0xd0 && rm <= 0xd7, f"expected RSTn, got 0xff$rm%02x")
          mc = new Ctx(data, q + 2)
          sinceRestart = 0
        }
      def block(c: Int, dcT: Int, acT: Int, bi: Int): Unit = {
        val base = bi * 64
        if (ss == 0) {
          if (ah == 0) coefZ(c)(base) = decodeDc(mc, c, dcT, dcL, dcU) << al
          else if (mc.dec.decode(mc.signBin, 0) != 0) coefZ(c)(base) |= (1 << al)
        } else {
          if (ah == 0) decodeAcBand(mc, acT, acKx, coefZ(c), base, ss, se, al)
          else decodeAcRefine(mc, acT, coefZ(c), base, ss, se, al)
        }
      }
      if (sComp.length == 1) {
        // non-interleaved: the component's OWN block grid (T.81 A.2.2)
        val c = sComp(0)
        val ch = compHV(c) >> 4
        val cv = compHV(c) & 0x0f
        val bw = (w * ch + 8 * hMax - 1) / (8 * hMax)
        val bh = (h * cv + 8 * vMax - 1) / (8 * vMax)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            maybeRestart()
            block(c, sDcT(0), sAcT(0), by * blocksW(c) + bx)
            sinceRestart += 1
            bx += 1
          }
          by += 1
        }
      } else {
        require(ss == 0 && se == 0,
          "interleaved progressive scan must be DC-only (T.81 G.1.1.1)")
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var sc = 0
            while (sc < sComp.length) {
              val c = sComp(sc)
              val ch = compHV(c) >> 4
              val cv = compHV(c) & 0x0f
              var by = 0
              while (by < cv) {
                var bx = 0
                while (bx < ch) {
                  block(c, sDcT(sc), sAcT(sc),
                    (my * cv + by) * blocksW(c) + (mx * ch + bx))
                  bx += 1
                }
                by += 1
              }
              sc += 1
            }
            sinceRestart += 1
            mx += 1
          }
          my += 1
        }
      }
      nextMarker(data, mc.dec.pos)
    }

    var p = 2
    var done = false
    while (!done) {
      require(p + 2 <= data.length, "truncated progressive JPEG")
      require((data(p) & 0xff) == 0xff, f"expected marker at $p")
      while (p + 2 < data.length && (data(p + 1) & 0xff) == 0xff) p += 1
      val m = data(p + 1) & 0xff
      if (m == 0xd9) done = true
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2
      else {
        require(p + 4 <= data.length, "truncated progressive JPEG")
        val len = u16(data, p + 2)
        val seg = p + 4
        m match {
          case 0xdb => parseDqt(data, seg, len, qt); p += 2 + len
          case 0xcc => parseDac(data, seg, len, dcL, dcU, acKx); p += 2 + len
          case 0xdd => restartInterval = u16(data, seg); p += 2 + len
          case 0xca =>
            require(w == 0, "multiple SOF markers")
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
            hMax = compHV.map(_ >> 4).max
            vMax = compHV.map(_ & 0x0f).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            blocksW = (0 until nc).map(c => mcusX * (compHV(c) >> 4)).toArray
            coefZ = (0 until nc).map(c =>
              new Array[Int](blocksW(c) * mcusY * (compHV(c) & 0x0f) * 64)).toArray
            p += 2 + len
          case mm if (mm >= 0xc0 && mm <= 0xcf) && mm != 0xc4 && mm != 0xc8 =>
            throw new UnsupportedOperationException(
              f"unsupported marker 0xff$mm%02x in a progressive arithmetic" +
                " stream (a second SOF)")
          case 0xda =>
            require(w > 0, "SOS before SOF10")
            val ns = data(seg) & 0xff
            require(ns >= 1 && ns <= nc, s"bad scan component count $ns")
            val sComp = new Array[Int](ns)
            val sDc = new Array[Int](ns)
            val sAc = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = data(seg + 1 + 2 * i) & 0xff
              val idx = compId.indexOf(cid)
              require(idx >= 0, s"scan references unknown component $cid")
              sComp(i) = idx
              sDc(i) = (data(seg + 2 + 2 * i) & 0xff) >> 4
              sAc(i) = data(seg + 2 + 2 * i) & 0x0f
              i += 1
            }
            val ss = data(seg + 1 + 2 * ns) & 0xff
            val se = data(seg + 2 + 2 * ns) & 0xff
            val aa = data(seg + 3 + 2 * ns) & 0xff
            require(ss <= se && se <= 63 && (ss != 0 || se == 0),
              s"bad spectral band $ss..$se")
            p = processScan(sComp, sDc, sAc, ss, se, aa >> 4, aa & 0x0f,
              seg + len - 2)
          case _ => p += 2 + len // APPn, COM, DHT, DNL, … — skip
        }
      }
    }
    require(w > 0 && h > 0, "missing SOF10 frame header")

    // dequantize the accumulated coefficients and run the IDCT once —
    // identical finishing pass to the Huffman progressive machine
    val planeW = (0 until nc).map(c => blocksW(c) * 8).toArray
    val planes = (0 until nc).map(c =>
      new Array[Int](blocksW(c) * 8 * mcusY * (compHV(c) & 0x0f) * 8)).toArray
    val nat = new Array[Int](64)
    val blk = new Array[Int](64)
    var c = 0
    while (c < nc) {
      val quant = qt(compQ(c))
      require(quant != null, s"missing quant table ${compQ(c)}")
      val bw = blocksW(c)
      val bh = mcusY * (compHV(c) & 0x0f)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val base = (by * bw + bx) * 64
          var k = 0
          while (k < 64) {
            nat(ZigZag(k)) = coefZ(c)(base + k) * quant(ZigZag(k))
            k += 1
          }
          idct(nat, blk)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(c)((by * 8 + yy) * planeW(c) + bx * 8 + xx) = blk(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    assemble(w, h, nc, compHV, hMax, vMax, planeW, planes)
  }
}
