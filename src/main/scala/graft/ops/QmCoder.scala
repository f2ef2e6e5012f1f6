package graft.ops

/** The adaptive binary arithmetic coder of T.81 Annex D (the "QM coder")
  * — the entropy layer of arithmetic-coded JPEG (SOF9/SOF10), which the
  * repo's Huffman decoder ([[JpegCodec]]) could not touch until now.
  *
  * Conventions (documented because no third-party arithmetic-JPEG codec
  * exists in this sandbox to conformance-test against — FIXTURES.md
  * "arithmetic fixtures" records the finding and the mitigations):
  *
  *  - Interval split per Annex D: the MPS owns the bottom `A − Qe` of the
  *    probability interval, the LPS the top `Qe`, with CONDITIONAL
  *    EXCHANGE when `A − Qe < Qe` (the "MPS smaller than LPS" inversion
  *    that renormalization guarantees is transient).
  *  - State machine: one (index, MPS) pair per context bin over the
  *    113-state Qe table of T.81 Table D.3, plus the non-adaptive
  *    index-113 bin JPEG uses for AC sign decisions (Qe ≈ 0.5, never
  *    transitions). Estimation transitions happen exactly on
  *    renormalization (NMPS on an MPS renorm, NLPS + optional MPS switch
  *    on an LPS).
  *  - Byte layer: JPEG marker stuffing — every 0xFF data byte is followed
  *    by an inserted 0x00, which the decoder strips; 0xFF followed by
  *    anything else is a marker, ending the entropy segment (the decoder
  *    feeds 0-bits from there, matching the encoder's CLEARBITS flush).
  *    Carries are handled with the pending-byte discipline: the last
  *    extracted non-0xFF byte stays unflushed and 0xFF bytes stack behind
  *    it, so a carry can only ever reach unflushed state (pending + 1,
  *    stacked 0xFFs roll to 0x00) — propagation into already-written
  *    bytes, which would corrupt the stuffing structure, is impossible
  *    by construction. The stuffing decision itself runs AFTER carry
  *    resolution (inside `emit`), covering the corner where the pending
  *    byte becomes 0xFF by carry.
  *
  * What IS verifiable offline and pinned by QmCoderSpec /
  * JpegArithSpec: encoder→decoder round-trip exactness on randomized
  * multi-context bit streams (every table state reachable), stuffing and
  * carry edge cases, table invariants (113 states, all Qe < 0x8000,
  * transitions in range, switch flags exactly at the chain heads), and —
  * through [[JpegArith]] — that an arithmetic-coded scan of known
  * quantized coefficients reconstructs pixel-identically to the
  * Huffman-path reconstruction of the same coefficients.
  *
  * Reference behavior anchor: the reference pipeline treats payloads as
  * opaque bytes (`/root/reference/pkg/converter/converter.go:52-57`);
  * codec depth is part of this repo's multimodal brief, not a reference
  * port. */
private[ops] object QmCoder {

  /** T.81 Table D.3: (Qe, NMPS, NLPS, switch) per state; index 113 is the
    * fixed ~0.5 bin (never transitions) JPEG's AC sign coding uses. */
  final val Qe: Array[Int] = Array(
    0x5A1D, 0x2586, 0x1114, 0x080B, 0x03D8, 0x01DA, 0x00E5, 0x006F,
    0x0036, 0x001A, 0x000D, 0x0006, 0x0003, 0x0001, 0x5A7F, 0x3F25,
    0x2CF2, 0x207C, 0x17B9, 0x1182, 0x0CEF, 0x09A1, 0x072F, 0x055C,
    0x0406, 0x0303, 0x0240, 0x01B1, 0x0144, 0x00F5, 0x00B7, 0x008A,
    0x0068, 0x004E, 0x003B, 0x002C, 0x5AE1, 0x484C, 0x3A0D, 0x2EF1,
    0x261F, 0x1F33, 0x19A8, 0x1518, 0x1177, 0x0E74, 0x0BFB, 0x09F8,
    0x0861, 0x0706, 0x05CD, 0x04DE, 0x040F, 0x0363, 0x02D4, 0x025C,
    0x01F8, 0x01A4, 0x0160, 0x0125, 0x00F6, 0x00CB, 0x00AB, 0x008F,
    0x5B12, 0x4D04, 0x412C, 0x37D8, 0x2FE8, 0x293C, 0x2379, 0x1EDF,
    0x1AA9, 0x174E, 0x1424, 0x119C, 0x0F6B, 0x0D51, 0x0BB6, 0x0A40,
    0x5832, 0x4D1C, 0x438E, 0x3BDD, 0x34EE, 0x2EAE, 0x299A, 0x2516,
    0x5570, 0x4CA9, 0x44D9, 0x3E22, 0x3824, 0x32B4, 0x2E17, 0x56A8,
    0x4F46, 0x47E5, 0x41CF, 0x3C3D, 0x375E, 0x5231, 0x4C0F, 0x4639,
    0x415E, 0x5627, 0x50E7, 0x4B85, 0x5597, 0x504F, 0x5A10, 0x5522,
    0x59EB, 0x5A1D)

  final val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 6, 7, 8,
    9, 10, 11, 12, 13, 13, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24,
    25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 9, 37, 38, 39, 40,
    41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56,
    57, 58, 59, 60, 61, 62, 63, 32,
    65, 66, 67, 68, 69, 70, 71, 72,
    73, 74, 75, 76, 77, 78, 79, 48,
    81, 82, 83, 84, 85, 86, 87, 71,
    89, 90, 91, 92, 93, 94, 86, 96,
    97, 98, 99, 100, 93, 102, 103, 104,
    99, 106, 107, 103, 109, 107, 111, 109,
    111, 113)

  final val Nlps: Array[Int] = Array(
    1, 14, 16, 18, 20, 23, 25, 28,
    30, 33, 35, 9, 10, 12, 15, 36,
    38, 39, 40, 42, 43, 45, 46, 48,
    49, 51, 52, 54, 56, 57, 59, 60,
    62, 63, 32, 33, 37, 64, 65, 67,
    68, 69, 70, 72, 73, 74, 75, 77,
    78, 79, 48, 50, 50, 51, 52, 53,
    54, 55, 56, 57, 58, 59, 61, 61,
    65, 80, 81, 82, 83, 84, 86, 87,
    87, 72, 72, 74, 74, 75, 77, 77,
    80, 88, 89, 90, 91, 92, 93, 86,
    88, 95, 96, 97, 99, 99, 93, 95,
    101, 102, 103, 104, 99, 105, 106, 107,
    103, 105, 108, 109, 110, 111, 110, 112,
    112, 113)

  final val Switch: Array[Boolean] = {
    val sw = new Array[Boolean](114)
    Seq(0, 14, 36, 64, 80, 88, 95, 105, 110, 112).foreach(sw(_) = true)
    sw
  }

  /** Context storage: `bins(i) = (stateIndex << 1) | mps`. A fresh array
    * (all zero = state 0, MPS 0) is the T.81 scan-start / restart
    * statistics reset. The fixed AC-sign bin must be pre-set to
    * [[fixedBin]] by the caller that wants it. */
  final val fixedBin: Int = 113 << 1

  final class Decoder(data: Array[Byte], start: Int) {
    private var bp = start // next unread position
    private var c = 0L
    private var a = 0L
    private var ct = 0
    /** True once the byte layer ran into a marker (or the array end) and
      * switched to feeding 0-bits — exposed so a scan decoder can detect
      * running off the entropy segment (truncated stream). */
    var pastEnd: Boolean = false
    /** Next unread byte position — after the last symbol of an entropy
      * segment this sits at most a few flush-residue bytes before the
      * terminating marker, which a caller locates by scanning for an
      * 0xFF whose successor is non-zero: inside entropy data every 0xFF
      * is followed by a stuffed 0x00. */
    def pos: Int = bp

    init()

    /** One entropy byte with the 0xFF 0x00 unstuffing convention; a
      * marker (0xFF + non-zero) or the array end ends the segment and
      * feeds 0-bits from then on — matching the encoder's CLEARBITS,
      * which zeroes every bit below the final interval's resolution. */
    private def readByte(): Int = {
      if (pastEnd || bp >= data.length) { pastEnd = true; return 0 }
      val d = data(bp) & 0xff
      if (d == 0xff) {
        val d2 = if (bp + 1 < data.length) data(bp + 1) & 0xff else 0xd9
        if (d2 == 0x00) { bp += 2; 0xff }
        else { pastEnd = true; 0 }
      } else { bp += 1; d }
    }

    private def byteIn(): Unit = { c += readByte().toLong << 8; ct = 8 }

    private def init(): Unit = {
      // C primed until Chigh carries 16 stream bits — the scale at which
      // it tracks the encoder's interval value against A's initial
      // 0x10000 (both registers must see IDENTICAL values at every
      // decision or the conditional-exchange tests diverge).
      c = readByte().toLong << 16
      byteIn()
      c <<= 7
      ct -= 7
      if (ct == 0) byteIn()
      c <<= 1
      ct -= 1
      a = 0x10000L
    }

    private def renorm(): Unit = {
      do {
        if (ct == 0) byteIn()
        a <<= 1
        c <<= 1
        ct -= 1
      } while (a < 0x8000L)
      c &= 0xffffffffL
    }

    /** Decode one binary decision in context bin `i` of `bins`. */
    def decode(bins: Array[Int], i: Int): Int = {
      val st = bins(i)
      val idx = st >>> 1
      val mps = st & 1
      val qe = Qe(idx).toLong
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffff) < a) {
        if (a < 0x8000L) { // MPS renorm path: conditional exchange check
          if (a < qe) { // exchange: this bottom region is really the LPS
            d = 1 - mps
            val nm = if (Switch(idx)) 1 - mps else mps
            bins(i) = (Nlps(idx) << 1) | nm
          } else {
            d = mps
            bins(i) = (Nmps(idx) << 1) | mps
          }
          renorm()
        } else d = mps
      } else { // top region
        c -= a << 16
        if (a < qe) { // exchange: the top region is really the MPS
          d = mps
          bins(i) = (Nmps(idx) << 1) | mps
        } else {
          d = 1 - mps
          val nm = if (Switch(idx)) 1 - mps else mps
          bins(i) = (Nlps(idx) << 1) | nm
        }
        a = qe
        renorm()
      }
      d
    }
  }

  final class Encoder {
    private val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var buffer = -1 // pending output byte; INVARIANT: never 0xFF
    private var sc = 0 // count of 0xFF bytes stacked behind `buffer`
    private var c = 0L
    private var a = 0x10000L
    private var ct = 11 // 8 data bits + 3 spacer bits before the first byte

    /** Emit one DATA byte with universal marker stuffing: every 0xFF
      * data byte is followed by an inserted 0x00 — including a byte that
      * BECAME 0xFF by carry (the subtle case: the stuffing decision must
      * run after carry resolution, which is why it lives here and not in
      * the caller). */
    private def emit(b: Int): Unit = {
      out += b.toByte
      if ((b & 0xff) == 0xff) out += 0x00.toByte
    }

    /** Pending-byte output discipline: a carry can only ever reach the
      * last UNFLUSHED byte, so 0xFF bytes are stacked (not flushed) until
      * a non-0xFF byte seals them — a carry rolls the pending byte up by
      * one and the stacked 0xFFs to 0x00; without a carry each stacked
      * 0xFF flushes with a stuffed 0x00 behind it so markers stay
      * unambiguous. This is the discipline that makes carry propagation
      * into already-flushed bytes (which would silently corrupt the
      * stuffing structure) impossible by construction. */
    private def byteOut(): Unit = {
      val t = (c >>> 19).toInt
      if (t > 0xff) {
        require(buffer >= 0, "arithmetic-coder carry before first byte")
        emit(buffer + 1) // buffer < 0xFF, so no overflow
        (0 until sc).foreach(_ => emit(0x00)) // 0xFF + carry = 0x00
        sc = 0
        val nb = t & 0xff
        // the spacer bits guarantee a post-carry byte is never 0xFF
        require(nb != 0xff, "post-carry byte 0xFF — spacer invariant broken")
        buffer = nb
      } else if (t == 0xff) sc += 1
      else {
        if (buffer >= 0) emit(buffer)
        (0 until sc).foreach(_ => emit(0xff)) // emit() adds the stuffed 0x00
        sc = 0
        buffer = t
      }
      c &= 0x7ffffL
      ct = 8
    }

    private def renorm(): Unit = {
      do {
        a <<= 1
        c <<= 1
        ct -= 1
        if (ct == 0) byteOut()
      } while (a < 0x8000L)
    }

    /** Encode one binary decision in context bin `i` of `bins`. */
    def encode(bins: Array[Int], i: Int, bit: Int): Unit = {
      val st = bins(i)
      val idx = st >>> 1
      val mps = st & 1
      val qe = Qe(idx).toLong
      a -= qe
      if (bit == mps) {
        if (a < 0x8000L) {
          if (a < qe) { c += a; a = qe } // exchange: MPS takes the top
          bins(i) = (Nmps(idx) << 1) | mps
          renorm()
        } // else: MPS at the bottom, nothing moves
      } else {
        if (a < qe) {
          // exchange: LPS takes the bottom (width a), C unchanged
        } else {
          c += a
          a = qe
        }
        val nm = if (Switch(idx)) 1 - mps else mps
        bins(i) = (Nlps(idx) << 1) | nm
        renorm()
      }
    }

    /** Terminate: point C at the interval's clean interior (low 16 bits
      * zeroed where possible) so a decoder feeding 0-bits past the
      * stream end stays inside every final interval, write the register
      * out, and drain the pending/stacked bytes. */
    def flush(): Array[Byte] = {
      val t = (c + a - 1) & 0xffff0000L
      c = if (t < c) t + 0x8000L else t
      c <<= ct
      byteOut()
      c <<= ct
      byteOut()
      if (buffer >= 0) emit(buffer)
      (0 until sc).foreach(_ => emit(0xff)) // emit() adds the stuffed 0x00
      buffer = -1
      sc = 0
      out.toArray
    }
  }
}
