package graft.ops

/** MP3 (MPEG-1/2/2.5 audio Layer III) FRAME-LEVEL parsing — the triage
  * layer of the codec boundary (VERDICT r13 "What's missing" item 3
  * names MP3 next to H.264): a training-data pipeline needs to walk
  * frame headers for duration/bitrate/sample-rate statistics, CBR/VBR
  * detection, resync across junk bytes, and ID3 tag skipping LONG before
  * it needs PCM — the subband synthesis / Huffman side of Layer III
  * stays external (documented in COVERAGE.md), exactly as the reference
  * treats payloads as opaque (`/root/reference/pkg/converter/
  * converter.go:52-57`).
  *
  * Header layout (ISO 11172-3 / 13818-3): 11 sync bits, 2 version bits
  * (3=MPEG1, 2=MPEG2, 0=MPEG2.5), 2 layer bits (1=Layer III), CRC flag,
  * 4 bitrate-index bits, 2 sample-rate bits, padding bit, then mode
  * bits this walker carries but does not interpret. Frame length =
  * 144·bitrate/sampleRate (+padding) for MPEG1, 72·bitrate/sampleRate
  * for MPEG2/2.5; 1152 samples/frame MPEG1, 576 otherwise. A candidate
  * header is accepted only if fully consistent (valid version/layer/
  * bitrate/sample-rate) — anything else advances one byte (resync). */
object Mp3Frames {

  /** kbps by [versionGroup][bitrateIndex]; group 0 = MPEG1 L3,
    * group 1 = MPEG2/2.5 L3. Index 0 = free format (unsupported here:
    * frame length unknowable without scanning), 15 = invalid. */
  private val BitrateKbps: Array[Array[Int]] = Array(
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1))

  private val SampleRate: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000)) // MPEG2.5

  final case class Frame(offset: Int, length: Int, bitrateKbps: Int,
      sampleRate: Int, samples: Int, crc: Boolean)

  final case class Walk(frames: Vector[Frame], resyncs: Int, id3Bytes: Int)

  /** Length of an ID3v2 tag at `p`, or 0. Syncsafe 28-bit size. */
  private def id3v2Len(d: Array[Byte], p: Int): Int = {
    if (p + 10 > d.length || d(p) != 'I' || d(p + 1) != 'D' || d(p + 2) != '3')
      return 0
    val sz = ((d(p + 6) & 0x7f) << 21) | ((d(p + 7) & 0x7f) << 14) |
      ((d(p + 8) & 0x7f) << 7) | (d(p + 9) & 0x7f)
    10 + sz
  }

  /** Parse a candidate header at `p`; None unless every field is valid
    * and the whole frame fits in the buffer. */
  private def frameAt(d: Array[Byte], p: Int): Option[Frame] = {
    if (p + 4 > d.length) return None
    val b0 = d(p) & 0xff; val b1 = d(p + 1) & 0xff
    val b2 = d(p + 2) & 0xff
    if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None
    val version = (b1 >> 3) & 0x03
    val layer = (b1 >> 1) & 0x03
    if (version == 1 || layer != 1) return None // reserved version / not Layer III
    val crc = (b1 & 0x01) == 0 // protection bit 0 = CRC present
    val brIdx = (b2 >> 4) & 0x0f
    val srIdx = (b2 >> 2) & 0x03
    if (srIdx == 3) return None
    val group = if (version == 3) 0 else 1
    val kbps = BitrateKbps(group)(brIdx)
    if (kbps <= 0) return None // free-format or invalid index
    val sr = SampleRate(version)(srIdx)
    val padding = (b2 >> 1) & 0x01
    val coef = if (version == 3) 144 else 72
    val len = coef * kbps * 1000 / sr + padding
    if (p + len > d.length) return None // truncated tail frame
    val samples = if (version == 3) 1152 else 576
    Some(Frame(p, len, kbps, sr, samples, crc))
  }

  /** Walk the whole buffer: skip a leading ID3v2 tag, then frames with
    * one-byte resync over anything that does not parse as a full valid
    * frame. `resyncs` counts maximal junk RUNS skipped between frames
    * (not bytes); a junk tail shorter than a header is not counted. */
  def walk(d: Array[Byte]): Walk = {
    var p = 0
    val id3 = id3v2Len(d, 0)
    p += math.min(id3, d.length)
    val frames = Vector.newBuilder[Frame]
    var resyncs = 0
    var inJunk = false
    while (p < d.length) {
      frameAt(d, p) match {
        case Some(f) =>
          frames += f
          p += f.length
          inJunk = false
        case None =>
          if (!inJunk && p + 4 <= d.length) { resyncs += 1; inJunk = true }
          p += 1
      }
    }
    Walk(frames.result(), resyncs, id3)
  }

  /** Synthesize one frame (header + zero payload) — the fixture builder
    * the q299 audit query and Mp3FramesSpec share. `version` 3/2/0,
    * Layer III fixed. */
  def buildFrame(version: Int, brIdx: Int, srIdx: Int, padding: Boolean,
      crc: Boolean = false): Array[Byte] = {
    val group = if (version == 3) 0 else 1
    val kbps = BitrateKbps(group)(brIdx)
    require(kbps > 0, s"bitrate index $brIdx not synthesizable")
    val sr = SampleRate(version)(srIdx)
    val coef = if (version == 3) 144 else 72
    val len = coef * kbps * 1000 / sr + (if (padding) 1 else 0)
    val out = new Array[Byte](len)
    out(0) = 0xff.toByte
    out(1) = (0xe0 | (version << 3) | (1 << 1) | (if (crc) 0 else 1)).toByte
    out(2) = ((brIdx << 4) | (srIdx << 2) | (if (padding) 2 else 0)).toByte
    out(3) = 0xc0.toByte // mono, no mode ext, no copyright/original
    out
  }

  /** Syncsafe ID3v2 tag of `payload` bytes. */
  def buildId3(payload: Int): Array[Byte] = {
    require(payload >= 0 && payload < (1 << 28))
    val out = new Array[Byte](10 + payload)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4
    out(6) = ((payload >> 21) & 0x7f).toByte
    out(7) = ((payload >> 14) & 0x7f).toByte
    out(8) = ((payload >> 7) & 0x7f).toByte
    out(9) = (payload & 0x7f).toByte
    out
  }
}
