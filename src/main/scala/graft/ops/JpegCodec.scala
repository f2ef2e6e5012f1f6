package graft.ops

/** Pure-JVM baseline JPEG decoder — the decode half of the multimodal
  * family's last stated codec boundary (COVERAGE.md carried "lossy codecs
  * external" since round 7; a real 100 TB corpus is mostly JPEG).
  *
  * Scope: Huffman-coded baseline/extended sequential DCT (SOF0/SOF1) AND
  * progressive (SOF2, spectral selection + successive approximation —
  * [[decodeProgressive]]) — together what cameras and web encoders emit —
  * with 1 or 3 components, arbitrary sampling factors (4:4:4, 4:2:0,
  * 4:2:2, …), 8/16-bit quant tables, and restart markers. Arithmetic
  * coding and hierarchical streams (SOF3+) are rejected with a clear
  * error: rejecting loudly beats decoding wrongly. Reference: ITU-T T.81
  * (the JPEG spec, public). The reference pipeline ships media payloads
  * around as opaque
  * bytes end to end (`/root/reference/pkg/converter/converter.go:52-57`
  * unmarshals the raw message bytes; `/root/reference/internal/collector/
  * collector.go:33` accumulates them untyped) — the decode itself is
  * net-new capability.
  *
  * The IDCT is the straightforward double-precision separable DCT-III
  * with final rounding. T.81 does not mandate one IDCT (conforming
  * decoders may differ by ±1/pixel), so cross-decoder checks are
  * tolerance-based: JpegCodecSpec pins this decoder against the JDK's
  * libjpeg-backed ImageIO reader on both gray and color images, and the
  * q284 query audits the agreement per document at corpus scale.
  *
  * Everything is per-row pure function — the Spark-side contract is the
  * same codec-per-partition seam as PNG ([[ImageOps.dhashFrameFrom]]):
  * decode inside `mapPartitions`, no driver involvement, no state.
  */
object JpegCodec {

  /** Decoded image: planar gray (`ncomp == 1`, `gray` length w·h) or
    * interleaved RGB (`ncomp == 3`, `rgb` length 3·w·h), values 0–255. */
  final case class Decoded(width: Int, height: Int, ncomp: Int,
      pixels: Array[Int])

  private[ops] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1) u π / 16) table for the separable IDCT
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }
  private val C0 = 1.0 / math.sqrt(2.0)

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // canonical code assignment per T.81 C.2: codes of length L are
    // consecutive, starting from (prev + 1) << 1
    val maxcode = new Array[Int](17)
    val mincode = new Array[Int](17)
    val valptr = new Array[Int](17)
    val huffval = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxcode(l) = code - 1
        if (bits(l - 1) == 0) maxcode(l) = -1 // no codes at this length
        code <<= 1
        l += 1
      }
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * byte-stuffing removal; stops at any non-stuffing marker. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var markerHit = false

    def readBit(): Int = {
      if (nbits == 0) {
        if (markerHit || pos >= data.length) return 0 // pad past marker (T.81 F.2.2.5)
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val b2 = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (b2 == 0x00) { pos += 1 } // stuffed 0xFF data byte
          else { markerHit = true; pos -= 1; return 0 }
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** Align to the next byte and consume an expected RSTn marker. */
    def restart(): Unit = {
      nbits = 0
      markerHit = false
      // skip to marker: 0xFF Dn
      while (pos + 1 < data.length && !((data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) >= 0xd0 && (data(pos + 1) & 0xff) <= 0xd7)) pos += 1
      if (pos + 1 < data.length) pos += 2
    }

    def decodeHuff(h: Huff): Int = {
      var code = readBit()
      var l = 1
      while (l <= 16 && (h.maxcode(l) == -1 || code > h.maxcode(l))) {
        code = (code << 1) | readBit()
        l += 1
      }
      require(l <= 16, "corrupt JPEG: Huffman code longer than 16 bits")
      h.huffval(h.valptr(l) + code - h.mincode(l))
    }
  }

  /** T.81 F.2.1.3.1 EXTEND: map the raw SSSS-bit magnitude to its signed
    * value. */
  private[ops] def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private[ops] def idct(coef: Array[Int], out: Array[Int]): Unit = {
    // rows (DCT-III over u for each y), then columns — double precision,
    // rounded once at the end; T.81 allows ±1 decoder variation here
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) C0 else 1.0
          s += cu * coef(y * 8 + u) * Cos(u * 8 + x)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) C0 else 1.0
          s += cv * tmp(v * 8 + x) * Cos(v * 8 + yy)
          v += 1
        }
        val p = math.round(s / 2.0 + 128.0).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  private[ops] def u16(d: Array[Byte], p: Int): Int =
    ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)

  /** DQT segment → quant tables in NATURAL (dezigzagged) order. */
  private[ops] def parseDqt(data: Array[Byte], seg: Int, len: Int,
      qt: Array[Array[Int]]): Unit = {
    var q = seg
    while (q < seg + len - 2) {
      val pq = (data(q) & 0xff) >> 4
      val tq = data(q) & 0x0f
      val tab = new Array[Int](64)
      var i = 0
      while (i < 64) {
        tab(ZigZag(i)) =
          if (pq == 0) data(q + 1 + i) & 0xff
          else u16(data, q + 1 + 2 * i)
        i += 1
      }
      qt(tq) = tab
      q += 1 + (if (pq == 0) 64 else 128)
    }
  }

  /** DHT segment → canonical Huffman tables (DC class 0, AC class 1). */
  private def parseDht(data: Array[Byte], seg: Int, len: Int,
      dcH: Array[Huff], acH: Array[Huff]): Unit = {
    var q = seg
    while (q < seg + len - 2) {
      val tc = (data(q) & 0xff) >> 4
      val th = data(q) & 0x0f
      val bits = (0 until 16).map(i => data(q + 1 + i) & 0xff).toArray
      val n = bits.sum
      val vals = (0 until n).map(i => data(q + 17 + i) & 0xff).toArray
      val hf = new Huff(bits, vals)
      if (tc == 0) dcH(th) = hf else acH(th) = hf
      q += 17 + n
    }
  }

  /** Component planes → the output raster: gray copy-out, or replication
    * chroma upsampling + JFIF YCbCr→RGB (shared by both scan machines). */
  private[ops] def assemble(w: Int, h: Int, nc: Int, compHV: Array[Int],
      hMax: Int, vMax: Int, planeW: Array[Int],
      planes: Array[Array[Int]]): Decoded = {
    if (nc == 1) {
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * planeW(0), out, y * w, w)
        y += 1
      }
      Decoded(w, h, 1, out)
    } else {
      val out = new Array[Int](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val Y = planes(0)((y * (compHV(0) & 0x0f) / vMax) * planeW(0)
            + (x * (compHV(0) >> 4) / hMax))
          val cb = planes(1)((y * (compHV(1) & 0x0f) / vMax) * planeW(1)
            + (x * (compHV(1) >> 4) / hMax)) - 128
          val cr = planes(2)((y * (compHV(2) & 0x0f) / vMax) * planeW(2)
            + (x * (compHV(2) >> 4) / hMax)) - 128
          def clamp(v: Double): Int = {
            val r = math.round(v).toInt
            if (r < 0) 0 else if (r > 255) 255 else r
          }
          val base = 3 * (y * w + x)
          out(base) = clamp(Y + 1.402 * cr)
          out(base + 1) = clamp(Y - 0.344136 * cb - 0.714136 * cr)
          out(base + 2) = clamp(Y + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      Decoded(w, h, 3, out)
    }
  }

  /** Decode a baseline/extended-sequential Huffman JPEG. Throws
    * IllegalArgumentException on malformed input and
    * UnsupportedOperationException on progressive/arithmetic/4-component
    * streams. */
  /** `salvageProgressive` (default OFF — every oracle-checked decode is
    * strict): progressive streams that fail MID-SCAN after at least one
    * complete scan decode to the raster the accumulated coefficients
    * produce, libjpeg's tolerance posture for real crawl data, instead
    * of throwing. Sequential streams are unaffected (their single scan
    * has nothing accumulated to salvage). */
  def decode(data: Array[Byte], salvageProgressive: Boolean = false): Decoded = {
    require(data.length > 4 && (data(0) & 0xff) == 0xff &&
      (data(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    val qt = new Array[Array[Int]](4)
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var restartInterval = 0
    // frame state
    var w = 0; var h = 0
    var nc = 0
    var compId: Array[Int] = null
    var compHV: Array[Int] = null // (h << 4) | v
    var compQ: Array[Int] = null
    var p = 2
    var sosAt = -1
    var scanComp: Array[Int] = null // component index per scan order
    var scanDc: Array[Int] = null
    var scanAc: Array[Int] = null
    while (sosAt < 0) {
      require(p + 2 <= data.length, "truncated JPEG before SOS")
      require((data(p) & 0xff) == 0xff, f"expected marker at $p")
      // T.81 B.1.1.2: a marker may be preceded by any number of 0xFF fill
      // bytes — skip to the last 0xFF before the marker id (ADVICE r11)
      while (p + 2 < data.length && (data(p + 1) & 0xff) == 0xff) p += 1
      val m = data(p + 1) & 0xff
      require(m != 0xd9, "EOI before SOS — stream carries no image scan")
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { p += 2 } // SOI/TEM/RSTn: no payload
      else if (p + 4 > data.length) {
        throw new IllegalArgumentException("truncated JPEG before SOS")
      }
      else {
        val len = u16(data, p + 2)
        val seg = p + 4
        m match {
          case 0xdb => parseDqt(data, seg, len, qt)
          case 0xc4 => parseDht(data, seg, len, dcH, acH)
          case 0xc0 | 0xc1 => // SOF0/SOF1: baseline / extended sequential
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
          case 0xc2 => // SOF2: hand the stream to the progressive machine
            return decodeProgressive(data, salvageProgressive)
          case 0xc9 => // SOF9: hand the stream to the arithmetic machine
            return JpegArith.decode(data)
          case 0xca => // SOF10: progressive arithmetic
            return JpegArith.decodeProgressive(data)
          case mm if mm >= 0xc3 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 =>
            throw new UnsupportedOperationException(
              f"unsupported SOF marker 0xff$mm%02x — sequential/progressive," +
                " Huffman (SOF0-2) and arithmetic (SOF9-10) only")
          case 0xdd => restartInterval = u16(data, seg)
          case 0xda => // SOS
            val ns = data(seg) & 0xff
            require(ns == nc, s"scan components $ns != frame components $nc" +
              " (multi-scan non-interleaved streams unsupported)")
            scanComp = new Array[Int](ns)
            scanDc = new Array[Int](ns); scanAc = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = data(seg + 1 + 2 * i) & 0xff
              val idx = compId.indexOf(cid)
              require(idx >= 0, s"scan references unknown component $cid")
              scanComp(i) = idx
              scanDc(i) = (data(seg + 2 + 2 * i) & 0xff) >> 4
              scanAc(i) = data(seg + 2 + 2 * i) & 0x0f
              i += 1
            }
            sosAt = seg + len - 2
          case _ => // APPn, COM, DNL, … — skip
        }
        if (sosAt < 0) p += 2 + len
      }
    }
    require(w > 0 && h > 0, "missing SOF before SOS")

    val hMax = compHV.map(_ >> 4).max
    val vMax = compHV.map(_ & 0x0f).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component plane at its own sampling resolution (padded to MCUs)
    val planeW = (0 until nc).map(c => mcusX * (compHV(c) >> 4) * 8).toArray
    val planeH = (0 until nc).map(c => mcusY * (compHV(c) & 0x0f) * 8).toArray
    val planes = (0 until nc).map(c => new Array[Int](planeW(c) * planeH(c))).toArray
    val dcPred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    val br = new BitReader(data, sosAt)
    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          br.restart()
          java.util.Arrays.fill(dcPred, 0)
          mcusSinceRestart = 0
        }
        var sc = 0
        while (sc < nc) {
          val c = scanComp(sc)
          val ch = compHV(c) >> 4
          val cv = compHV(c) & 0x0f
          val quant = qt(compQ(c))
          require(quant != null, s"missing quant table ${compQ(c)}")
          // a scan referencing an undelivered Huffman table must fail like
          // the quant check above, not NPE inside decodeHuff (ADVICE r11)
          require(dcH(scanDc(sc)) != null, s"missing DC Huffman table ${scanDc(sc)}")
          require(acH(scanAc(sc)) != null, s"missing AC Huffman table ${scanAc(sc)}")
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < ch) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val t = br.decodeHuff(dcH(scanDc(sc)))
              val diff = extend(br.readBits(t), t)
              dcPred(c) += diff
              coef(0) = dcPred(c) * quant(0)
              // AC
              var k = 1
              while (k < 64) {
                val rs = br.decodeHuff(acH(scanAc(sc)))
                val r = rs >> 4
                val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  require(k < 64, "corrupt JPEG: AC index overrun")
                  coef(ZigZag(k)) = extend(br.readBits(s), s) * quant(ZigZag(k))
                  k += 1
                }
              }
              idct(coef, blk)
              // place block into the component plane
              val ox = (mx * ch + bx) * 8
              val oy = (my * cv + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(c)((oy + yy) * planeW(c) + ox + xx) = blk(yy * 8 + xx)
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

  /** Progressive (SOF2) Huffman decode — T.81 annex G: coefficients
    * accumulate across SCANS in per-component zigzag buffers, each scan a
    * (spectral band Ss..Se, successive-approximation Ah→Al) pass:
    *
    *  - DC first (Ss=0, Ah=0): sequential DC differences, values << Al;
    *    the only scan kind that may interleave several components.
    *  - DC refinement (Ah>0): one raw bit per block ORs in bit Al — no
    *    Huffman table at all.
    *  - AC first (Ss≥1, Ah=0): run/size coding within the band plus the
    *    EOBRUN extension (G.1.2.2) — an EOB code of run r ends this block
    *    and skips the band in the next 2^r−1+ext blocks.
    *  - AC refinement (G.1.2.3): the correction pass — every already-
    *    nonzero band coefficient consumes one correction bit (adding
    *    ±2^Al when set and bit Al is still clear), newly significant
    *    coefficients arrive as ±2^Al positioned by zero-HISTORY runs, and
    *    an EOB run finishes the correction bits of the current block
    *    before skipping.
    *
    * Non-interleaved scans walk the component's OWN ceil(dim/8) block
    * grid (A.2.2), not the MCU-padded one; restart intervals reset DC
    * predictors AND the EOB run. Dequantization and the IDCT run once at
    * the end over the accumulated coefficients. Arithmetic coding and
    * hierarchical (SOF3+) streams remain rejected.
    *
    * `salvage` — the decode-what-accumulated mode (VERDICT r12 item 3):
    * progressive streams are incremental by construction (every scan
    * refines the same coefficient array), so when a mid-stream scan is
    * truncated or corrupt the coefficients accumulated so far still
    * dequantize to a coarser but valid raster — exactly what libjpeg
    * renders for a damaged crawl payload. With salvage on, a failure
    * after ≥1 complete scan (and a parsed SOF2) stops scan processing
    * and finishes from the accumulated state — including any partial
    * writes of the failing scan, which are a deterministic function of
    * the bytes. A failure before any complete scan still throws: there
    * is nothing to salvage. Default OFF: the strict posture every
    * oracle-checked decode runs under (JpegCodecSpec pins both). */
  private def decodeProgressive(data: Array[Byte], salvage: Boolean = false): Decoded = {
    val qt = new Array[Array[Int]](4)
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var restartInterval = 0
    var w = 0; var h = 0
    var nc = 0
    var compId: Array[Int] = null
    var compHV: Array[Int] = null
    var compQ: Array[Int] = null
    var hMax = 0; var vMax = 0
    var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null
    // per component: blocksW·blocksH blocks × 64 coefficients in ZIGZAG
    // order, accumulated across scans, dequantized once at the end
    var coefZ: Array[Array[Int]] = null
    val dcPred = new Array[Int](4)

    /** One scan's entropy-coded data starting at `startPos`; returns the
      * position of the first marker after the scan. */
    def processScan(scanComp: Array[Int], scanDcT: Array[Int],
        scanAcT: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
        startPos: Int): Int = {
      val br = new BitReader(data, startPos)
      var eobrun = 0
      java.util.Arrays.fill(dcPred, 0)
      val ns = scanComp.length
      val p1 = 1 << al
      val m1 = -1 << al

      def dcFirst(c: Int, tbl: Huff, bi: Int): Unit = {
        val t = br.decodeHuff(tbl)
        dcPred(c) += extend(br.readBits(t), t)
        coefZ(c)(bi * 64) = dcPred(c) << al
      }
      def dcRefine(c: Int, bi: Int): Unit =
        if (br.readBit() != 0) coefZ(c)(bi * 64) |= p1

      def acFirst(c: Int, tbl: Huff, bi: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        val base = bi * 64
        var k = ss
        var brk = false
        while (!brk && k <= se) {
          val rs = br.decodeHuff(tbl)
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.readBits(r)
              brk = true
            } else k += 16 // ZRL
          } else {
            k += r
            require(k <= se, "corrupt progressive JPEG: AC index overrun")
            coefZ(c)(base + k) = extend(br.readBits(s), s) << al
            k += 1
          }
        }
      }

      def acRefine(c: Int, tbl: Huff, bi: Int): Unit = {
        val base = bi * 64
        var k = ss
        if (eobrun == 0) {
          var brk = false
          while (!brk && k <= se) {
            val rs = br.decodeHuff(tbl)
            var r = rs >> 4
            val s = rs & 0x0f
            var value = 0
            if (s == 0) {
              if (r < 15) {
                eobrun = 1 << r
                if (r > 0) eobrun += br.readBits(r)
                brk = true // correction bits of THIS block finish below
              }
              // r == 15: a run of 16 zero-history coefficients
            } else {
              require(s == 1, "corrupt progressive JPEG: refinement size != 1")
              value = if (br.readBit() != 0) p1 else m1
            }
            if (!brk) {
              // advance past r zero-HISTORY coefficients, emitting one
              // correction bit per already-nonzero coefficient passed
              var placed = false
              while (!placed && k <= se) {
                val cur = coefZ(c)(base + k)
                if (cur != 0) {
                  if (br.readBit() != 0 && (cur & p1) == 0)
                    coefZ(c)(base + k) = cur + (if (cur >= 0) p1 else m1)
                } else {
                  if (r == 0) {
                    if (value != 0) coefZ(c)(base + k) = value
                    placed = true
                  } else r -= 1
                }
                k += 1
              }
            }
          }
        }
        if (eobrun > 0) {
          // EOB run covers the REST of this block's correction bits
          while (k <= se) {
            val cur = coefZ(c)(base + k)
            if (cur != 0) {
              if (br.readBit() != 0 && (cur & p1) == 0)
                coefZ(c)(base + k) = cur + (if (cur >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
      }

      var sinceRestart = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          br.restart()
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
          sinceRestart = 0
        }

      if (ns == 1) {
        // non-interleaved: the component's OWN block grid (T.81 A.2.2)
        val c = scanComp(0)
        val ch = compHV(c) >> 4
        val cv = compHV(c) & 0x0f
        val bw = (w * ch + 8 * hMax - 1) / (8 * hMax)
        val bh = (h * cv + 8 * vMax - 1) / (8 * vMax)
        val dcT = if (ss == 0 && ah == 0) {
          require(dcH(scanDcT(0)) != null, s"missing DC Huffman table ${scanDcT(0)}")
          dcH(scanDcT(0))
        } else null
        val acT = if (ss > 0) {
          require(acH(scanAcT(0)) != null, s"missing AC Huffman table ${scanAcT(0)}")
          acH(scanAcT(0))
        } else null
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            maybeRestart()
            val bi = by * blocksW(c) + bx
            if (ss == 0) { if (ah == 0) dcFirst(c, dcT, bi) else dcRefine(c, bi) }
            else { if (ah == 0) acFirst(c, acT, bi) else acRefine(c, acT, bi) }
            sinceRestart += 1
            bx += 1
          }
          by += 1
        }
      } else {
        require(ss == 0 && se == 0,
          "interleaved progressive scan must be DC-only (T.81 G.1.1.1)")
        val dcT = scanComp.indices.map { i =>
          if (ah == 0) {
            require(dcH(scanDcT(i)) != null, s"missing DC Huffman table ${scanDcT(i)}")
            dcH(scanDcT(i))
          } else null
        }.toArray
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var sc = 0
            while (sc < ns) {
              val c = scanComp(sc)
              val ch = compHV(c) >> 4
              val cv = compHV(c) & 0x0f
              var by = 0
              while (by < cv) {
                var bx = 0
                while (bx < ch) {
                  val bi = (my * cv + by) * blocksW(c) + (mx * ch + bx)
                  if (ah == 0) dcFirst(c, dcT(sc), bi) else dcRefine(c, bi)
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
      // advance to the first true marker after the scan's entropy data
      // (skipping stuffed 0xFF00 and any unconsumed RSTn)
      var q = br.pos
      def atMarker(i: Int): Boolean = (data(i) & 0xff) == 0xff && {
        val mm = data(i + 1) & 0xff
        mm != 0x00 && !(mm >= 0xd0 && mm <= 0xd7)
      }
      while (q + 1 < data.length && !atMarker(q)) q += 1
      q
    }

    var p = 2
    var done = false
    var scansDone = 0
    try {
    while (!done) {
      require(p + 2 <= data.length, "truncated progressive JPEG")
      require((data(p) & 0xff) == 0xff, f"expected marker at $p")
      while (p + 2 < data.length && (data(p + 1) & 0xff) == 0xff) p += 1
      val m = data(p + 1) & 0xff
      if (m == 0xd9) done = true // EOI
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2
      else {
        require(p + 4 <= data.length, "truncated progressive JPEG")
        val len = u16(data, p + 2)
        val seg = p + 4
        m match {
          case 0xdb => parseDqt(data, seg, len, qt); p += 2 + len
          case 0xc4 => parseDht(data, seg, len, dcH, acH); p += 2 + len
          case 0xdd => restartInterval = u16(data, seg); p += 2 + len
          case 0xc2 =>
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
              f"unsupported marker 0xff$mm%02x in a progressive stream" +
                " (arithmetic coding conditioning or a second SOF)")
          case 0xda =>
            require(w > 0, "SOS before SOF2")
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
            val ah = aa >> 4
            val al = aa & 0x0f
            // T.81 G.1: a DC scan (Ss=0) must have Se=0 — processScan
            // treats any ss==0 scan as DC-only, so an Ss=0/Se>0 header
            // would silently drop the AC band and desync the bitstream.
            require(ss <= se && se <= 63 && (ss != 0 || se == 0),
              s"bad spectral band $ss..$se")
            p = processScan(sComp, sDc, sAc, ss, se, ah, al, seg + len - 2)
            scansDone += 1
          case _ => p += 2 + len // APPn, COM, DNL, … — skip
        }
      }
    }
    } catch {
      // salvage: stop consuming scans, render the accumulated state.
      // Guarded on ≥1 complete scan + a parsed frame header — a stream
      // that never yielded a scan has no image to degrade to, so the
      // strict error propagates even with salvage on.
      case scala.util.control.NonFatal(_) if salvage && scansDone > 0 && w > 0 => ()
    }
    require(w > 0 && h > 0, "missing SOF2 frame header")

    // dequantize the accumulated coefficients and run the IDCT once
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
