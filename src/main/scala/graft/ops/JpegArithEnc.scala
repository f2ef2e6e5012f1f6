package graft.ops

/** Arithmetic-JPEG ENCODER (SOF9 sequential / SOF10 progressive) — the
  * exact encode-side mirror of [[JpegArith]]'s statistical models, living
  * in main for the same reason `ImageOps.jpegEncodeRgbJdk` does: the
  * audit queries (q298/q299) self-generate their fixtures per document at
  * query time, and the codec-level specs (JpegArithSpec,
  * JpegArithProgSpec) drive adversarial coefficient sets through it.
  *
  * The encoder works from the FINAL quantized coefficients (zigzag
  * order): a scan at approximation (Ah, Al) derives what the decoder has
  * accumulated so far from `|v| >> Ah` and what it must transmit from
  * `|v| >> Al` — the successive-approximation invariant Ah = Al + 1 for
  * refinement scans is required (a coefficient first enters at the scan
  * that exposes its magnitude's top bit, so a newly-nonzero coefficient
  * in a refine scan always carries current magnitude exactly 1). */
private[ops] object JpegArithEnc {

  /** One scan of a script: component indices (into the frame's component
    * list), spectral band [ss, se], successive approximation (ah, al).
    * Sequential JPEG is the single scan (all comps, 0, 63, 0, 0). */
  final case class Scan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)

  /** Statistical state of ONE entropy segment (scan or restart
    * interval); mirrors JpegArith's decode contexts bin for bin. */
  final class ScanEncoder(dcL: Array[Int], dcU: Array[Int], acKx: Array[Int]) {
    val enc = new QmCoder.Encoder
    private val dcBins = Array.fill(4)(new Array[Int](64))
    private val acBins = Array.fill(4)(new Array[Int](256))
    private val signBin = Array(QmCoder.fixedBin)
    private val dcPred = new Array[Int](4)
    private val dcCtx = new Array[Int](4)

    /** DC-first (and sequential DC): encode the diff of the scan-shifted
      * DC value against the running predictor. */
    def dcFirst(c: Int, dcT: Int, dcShifted: Int): Unit = {
      val db = dcBins(dcT)
      val diff = dcShifted - dcPred(c)
      dcPred(c) = dcShifted
      val base = dcCtx(c)
      if (diff == 0) { enc.encode(db, base, 0); dcCtx(c) = 0 }
      else {
        enc.encode(db, base, 1)
        val sign = if (diff < 0) 1 else 0
        enc.encode(db, base + 1, sign)
        val sz = math.abs(diff) - 1
        var st = base + 2 + sign
        var m = 0
        if (sz == 0) enc.encode(db, st, 0)
        else {
          enc.encode(db, st, 1)
          m = 1
          st = 20
          while ((m << 1) <= sz) { enc.encode(db, st, 1); m <<= 1; st += 1 }
          enc.encode(db, st, 0)
        }
        dcCtx(c) =
          if (m < ((1 << dcL(dcT)) >> 1)) 0
          else if (m > ((1 << dcU(dcT)) >> 1)) 12 + 4 * sign
          else 4 + 4 * sign
        var mm = m >> 1
        st += 14
        while (mm != 0) {
          enc.encode(db, st, if ((sz & mm) != 0) 1 else 0)
          mm >>= 1
        }
      }
    }

    /** DC refinement: one fixed-bin bit per block. */
    def dcRefine(bit: Int): Unit = enc.encode(signBin, 0, bit)

    /** AC-first (and sequential AC): code band [ss, se] of one block's
      * zigzag coefficients at precision al. */
    def acFirst(acT: Int, z: Array[Int], base: Int, ss: Int, se: Int,
        al: Int): Unit = {
      val ab = acBins(acT)
      val kx = acKx(acT)
      def cur(k: Int): Int = {
        val v = z(base + k)
        val mag = math.abs(v) >> al
        if (v < 0) -mag else mag
      }
      val lastNz = (se to ss by -1).find(cur(_) != 0).getOrElse(ss - 1)
      var k = ss
      var done = false
      while (k <= se && !done) {
        var st = 3 * (k - 1)
        if (k > lastNz) { enc.encode(ab, st, 1); done = true } // EOB
        else {
          enc.encode(ab, st, 0)
          while (cur(k) == 0) { enc.encode(ab, st + 1, 0); k += 1; st += 3 }
          enc.encode(ab, st + 1, 1)
          val x = cur(k)
          val sign = if (x < 0) 1 else 0
          enc.encode(signBin, 0, sign)
          val sz = math.abs(x) - 1
          st += 2
          var m = 0
          if (sz == 0) enc.encode(ab, st, 0)
          else {
            enc.encode(ab, st, 1)
            if (sz == 1) { m = 1; enc.encode(ab, st, 0) }
            else {
              enc.encode(ab, st, 1)
              m = 2
              st = if (k <= kx) 189 else 217
              while ((m << 1) <= sz) { enc.encode(ab, st, 1); m <<= 1; st += 1 }
              enc.encode(ab, st, 0)
            }
          }
          var mm = m >> 1
          st += 14
          while (mm != 0) {
            enc.encode(ab, st, if ((sz & mm) != 0) 1 else 0)
            mm >>= 1
          }
          k += 1
        }
      }
    }

    /** AC refinement at (ah, al): correction bits for history-nonzero
      * coefficients, newly-nonzero flags + sign for the rest, EOB once
      * past both the history and the new content. */
    def acRefine(acT: Int, z: Array[Int], base: Int, ss: Int, se: Int,
        ah: Int, al: Int): Unit = {
      val ab = acBins(acT)
      def histNz(k: Int): Boolean = (math.abs(z(base + k)) >> ah) != 0
      def curMag(k: Int): Int = math.abs(z(base + k)) >> al
      val kex = (se to ss by -1).find(histNz).getOrElse(ss - 1)
      val kEnd = (se to ss by -1).find(curMag(_) != 0).getOrElse(ss - 1)
      var k = ss
      var done = false
      while (k <= se && !done) {
        var st = 3 * (k - 1)
        if (k > kex) {
          val eob = k > kEnd
          enc.encode(ab, st, if (eob) 1 else 0)
          if (eob) done = true
        }
        if (!done) {
          var placed = false
          while (!placed) {
            if (histNz(k)) {
              enc.encode(ab, st + 2, curMag(k) & 1)
              placed = true
            } else {
              val newly = curMag(k) != 0
              enc.encode(ab, st + 1, if (newly) 1 else 0)
              if (newly) {
                require(curMag(k) == 1,
                  s"refine scan (ah=$ah, al=$al) would expose magnitude " +
                    s"${curMag(k)} at k=$k — script must refine one bit at a time")
                enc.encode(signBin, 0, if (z(base + k) < 0) 1 else 0)
                placed = true
              } else {
                st += 3; k += 1
                require(k <= se, "refine run past end of band")
              }
            }
          }
          k += 1
        }
      }
    }

    def flush(): Array[Byte] = enc.flush()
  }

  /** Entropy-free rendering of quantized coefficient blocks — dequant +
    * IDCT + plane assembly, the exact pixel path the arithmetic decoders
    * end with. The q298 audit query and the codec specs compare a decode
    * of an encoded stream against this to isolate the entropy layer:
    * any defect in the QM coder or the statistical models changes the
    * decoded coefficients and breaks pixel equality. */
  def render(w: Int, h: Int, compHV: Array[Int],
      qtNat: Array[Array[Int]], compQ: Array[Int],
      blocksZ: Array[Array[Array[Array[Int]]]]): JpegCodec.Decoded = {
    val nc = compHV.length
    val hMax = compHV.map(_ >> 4).max
    val vMax = compHV.map(_ & 0x0f).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = (0 until nc).map(c => mcusX * (compHV(c) >> 4) * 8).toArray
    val planes = (0 until nc).map { c =>
      new Array[Int](planeW(c) * mcusY * (compHV(c) & 0x0f) * 8)
    }.toArray
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    var c = 0
    while (c < nc) {
      val grid = blocksZ(c)
      var r = 0
      while (r < grid.length) {
        var col = 0
        while (col < grid(r).length) {
          java.util.Arrays.fill(coef, 0)
          val z = grid(r)(col)
          var i = 0
          while (i < 64) {
            coef(JpegCodec.ZigZag(i)) = z(i) * qtNat(compQ(c))(JpegCodec.ZigZag(i))
            i += 1
          }
          JpegCodec.idct(coef, blk)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(c)((r * 8 + yy) * planeW(c) + col * 8 + xx) = blk(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          col += 1
        }
        r += 1
      }
      c += 1
    }
    JpegCodec.assemble(w, h, nc, compHV, hMax, vMax, planeW, planes)
  }

  /** Assemble a complete arithmetic JPEG. `blocksZ(c)(row)(col)` holds
    * each 8×8 block's FINAL quantized coefficients in zigzag order;
    * `script` selects sequential (one full-band scan → SOF9) or a
    * progressive script (→ SOF10). Geometry must tile exactly. */
  def encode(w: Int, h: Int, compHV: Array[Int],
      qtNat: Array[Array[Int]], compQ: Array[Int],
      blocksZ: Array[Array[Array[Array[Int]]]],
      script: Seq[Scan],
      dcL: Array[Int] = Array.fill(4)(0),
      dcU: Array[Int] = Array.fill(4)(1),
      acKx: Array[Int] = Array.fill(4)(5),
      restartInterval: Int = 0,
      emitDac: Boolean = false): Array[Byte] = {
    val nc = compHV.length
    val progressive = script.length > 1 ||
      script.exists(s => s.ah > 0 || s.al > 0 || (s.ss, s.se) != (0, 63))
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16b(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    qtNat.indices.foreach { t =>
      marker(0xdb); u16b(2 + 1 + 64); u8(t)
      (0 until 64).foreach(i => u8(qtNat(t)(JpegCodec.ZigZag(i))))
    }
    if (emitDac) {
      marker(0xcc); u16b(2 + 4)
      u8(0x00); u8((dcU(0) << 4) | dcL(0))
      u8(0x10); u8(acKx(0))
    }
    marker(if (progressive) 0xca else 0xc9)
    u16b(8 + 3 * nc); u8(8); u16b(h); u16b(w); u8(nc)
    (0 until nc).foreach { c => u8(c + 1); u8(compHV(c)); u8(compQ(c)) }
    if (restartInterval > 0) { marker(0xdd); u16b(4); u16b(restartInterval) }

    val hMax = compHV.map(_ >> 4).max
    val vMax = compHV.map(_ & 0x0f).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)

    script.foreach { scan =>
      require(scan.ss <= scan.se && scan.se <= 63 &&
        (scan.ss != 0 || scan.se == 0) || !progressive,
        s"bad progressive band ${scan.ss}..${scan.se}")
      marker(0xda)
      val ns = scan.comps.length
      u16b(6 + 2 * ns); u8(ns)
      scan.comps.foreach { c => u8(c + 1); u8(0x00) } // cond tables 0
      u8(scan.ss); u8(if (progressive) scan.se else 63)
      u8((scan.ah << 4) | scan.al)

      var se2 = new ScanEncoder(dcL, dcU, acKx)
      var sinceRestart = 0
      var rstIdx = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          out.write(se2.flush())
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          se2 = new ScanEncoder(dcL, dcU, acKx)
          sinceRestart = 0
        }
      def encodeBlock(c: Int, z: Array[Int]): Unit = {
        if (scan.ss == 0) {
          // T.81's point transform is an ARITHMETIC shift for DC (G.1.2.1)
          // but sign-magnitude for AC (G.1.2.2) — the decoder reconstructs
          // DC as (first << al) | refine-bits, which round-trips negatives
          // only under the arithmetic-shift convention
          if (scan.ah == 0) se2.dcFirst(c, 0, z(0) >> scan.al)
          else se2.dcRefine((z(0) >> scan.al) & 1)
        }
        if (!progressive) se2.acFirst(0, z, 0, 1, 63, 0)
        else if (scan.ss > 0) {
          if (scan.ah == 0) se2.acFirst(0, z, 0, scan.ss, scan.se, scan.al)
          else se2.acRefine(0, z, 0, scan.ss, scan.se, scan.ah, scan.al)
        }
      }
      if (ns == 1 && progressive) {
        // non-interleaved: the component's own block grid (T.81 A.2.2)
        val c = scan.comps.head
        val ch = compHV(c) >> 4
        val cv = compHV(c) & 0x0f
        val bw = (w * ch + 8 * hMax - 1) / (8 * hMax)
        val bh = (h * cv + 8 * vMax - 1) / (8 * vMax)
        for (by <- 0 until bh; bx <- 0 until bw) {
          maybeRestart()
          encodeBlock(c, blocksZ(c)(by)(bx))
          sinceRestart += 1
        }
      } else {
        require(!progressive || scan.ss == 0,
          "interleaved progressive scan must be DC-only (T.81 G.1.1.1)")
        for (my <- 0 until mcusY; mx <- 0 until mcusX) {
          maybeRestart()
          scan.comps.foreach { c =>
            val ch = compHV(c) >> 4
            val cv = compHV(c) & 0x0f
            for (by <- 0 until cv; bx <- 0 until ch)
              encodeBlock(c, blocksZ(c)(my * cv + by)(mx * ch + bx))
          }
          sinceRestart += 1
        }
      }
      out.write(se2.flush())
    }
    marker(0xd9)
    out.toByteArray
  }
}
