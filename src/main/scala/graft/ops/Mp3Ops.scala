package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** MP3 (MPEG-1 Audio Layer III) frame-level demux — the compressed-audio
  * container gap named in the round-13 verdict's codec-boundary list (the
  * reference treats all payloads as opaque — `/root/reference/pkg/converter/
  * converter.go:52-57` — so like the rest of the multimodal family this
  * extends the engine's curation surface per the north star, it does not
  * port anything).
  *
  * Scope is FRAME-LEVEL, deliberately: at 100 TB the audio-curation hot
  * path is header metadata — duration, bitrate shape (CBR vs VBR), sample
  * rate, channel layout, integrity — extracted WITHOUT entropy-decoding
  * audio, exactly like q243 skips non-sampled video frames. A full Layer
  * III entropy decode (Huffman + IMDCT + polyphase synthesis) only pays
  * off once per KEPT clip, far downstream of this filter.
  *
  * The demux walks real ISO/IEC 11172-3 framing, all from parsed bytes:
  *
  *   - ID3v2 tag skip ("ID3" magic + 4-byte SYNCSAFE length — 7 bits per
  *     byte, the real-world gotcha);
  *   - sync-scan to the first 0xFFE frame sync (crawl data has junk
  *     prefixes; the parser resynchronizes, it does not assume offset 0);
  *   - per-frame 4-byte header decode: version/layer validation, bitrate
  *     index, sample-rate index, padding bit, channel mode;
  *   - frame-length walk `144·bitrate/samplerate + padding` (the Layer
  *     III MPEG-1 formula) — frames are STEPPED, never decoded;
  *   - CRC-16 verification when the protection bit is set (poly 0x8005,
  *     init 0xFFFF, over header bytes 2-3 + the full side info — 17 bytes
  *     mono / 32 stereo), so a single flipped byte in the protected
  *     region fails the audit;
  *   - Xing/VBR header extraction from the first frame's payload (frame
  *     and byte totals — the field real VBR streams carry so players can
  *     seek without walking).
  *
  * Correctness is strict end-to-end: the stream is synthesized per
  * document from a closed-form schedule of doc_id (frame count, per-frame
  * bitrate index, padding, channel mode, CRC posture, tag/junk prefix),
  * the Spark side goes the long way — encode real framed bytes, then walk
  * them back with the parser — while the DuckDB oracle computes the same
  * integers from the schedule directly. Any header-layout, syncsafe,
  * frame-length, CRC or Xing defect breaks the hash match.
  *
  * Scale shape: one mapPartitions codec seam (synthesize + demux per doc,
  * the house rule for codec boundaries), then narrow per-doc rows — the
  * corpus shuffles ~11 small integers per document, never media bytes.
  */
object Mp3Ops {

  /** MPEG-1 Layer III bitrate table, kbps, index 1..14 (0 = free, 15 = bad). */
  private[ops] val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, index 0..2 (3 = reserved). */
  private[ops] val SampleRate: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per Layer III MPEG-1 frame. */
  private[ops] val SamplesPerFrame = 1152

  // --------------------------------------------------------- schedule

  /** The per-document stream schedule — the single source of truth shared
    * by the synthesizer and (in SQL form) the oracle. Everything here must
    * stay closed-form in doc_id so DuckDB can replicate it. */
  private[ops] final case class Schedule(id: Long) {
    val srIdx: Int = (id % 3).toInt
    val sr: Int = SampleRate(srIdx)
    val stereo: Boolean = id % 2 == 1
    val sideBytes: Int = if (stereo) 32 else 17
    val crc: Boolean = id % 3 == 0
    val cbr: Boolean = id % 4 == 0
    val nFrames: Int = (6 + id % 7).toInt
    def bi(f: Int): Int =
      if (cbr) (1 + id % 14).toInt else (1 + (id * 7 + f * 5) % 14).toInt
    def pad(f: Int): Int = ((id + f) % 2).toInt
    def frameLen(f: Int): Int = 144000 * BitrateKbps(bi(f)) / sr + pad(f)
    val streamBytes: Int = (0 until nFrames).map(frameLen).sum
  }

  // ------------------------------------------------------------ crc-16

  /** ISO/IEC 11172-3 CRC: poly x^16+x^15+x^2+1 (0x8005), init 0xFFFF,
    * MSB-first over the given bytes. */
  private[ops] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0xffff
    var i = from
    while (i < until) {
      val b = bytes(i) & 0xff
      var bit = 7
      while (bit >= 0) {
        val fb = ((crc >> 15) ^ (b >> bit)) & 1
        crc = (crc << 1) & 0xffff
        if (fb == 1) crc ^= 0x8005
        bit -= 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------- synth

  /** Real framed MPEG-1 Layer III bytes for one document: optional ID3v2
    * tag (doc_id ≡ 0 mod 5) or junk prefix (≡ 1 mod 5), then the frame
    * walk from [[Schedule]] — valid headers, correct CRCs, a Xing block
    * in frame 0 of every VBR stream. Payload filler is mod-251 so 0xFF
    * (and thus a false sync) can never appear outside real headers. */
  private[ops] def mp3Bytes(id: Long): Array[Byte] = {
    val sch = Schedule(id)
    val out = new java.io.ByteArrayOutputStream(sch.streamBytes + 64)

    if (id % 5 == 0) { // ID3v2.3 tag with a syncsafe length to skip
      val body = (10 + id % 30).toInt
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // version 2.3.0, flags 0
      out.write((body >> 21) & 0x7f); out.write((body >> 14) & 0x7f)
      out.write((body >> 7) & 0x7f); out.write(body & 0x7f)
      (0 until body).foreach(j => out.write(((id + j) % 128).toInt))
    } else if (id % 5 == 1) { // junk before the first sync — force a resync
      val junk = (3 + id % 4).toInt
      (0 until junk).foreach(j => out.write((1 + (id + j) % 200).toInt))
    }

    (0 until sch.nFrames).foreach { f =>
      val len = sch.frameLen(f)
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      frame(1) = (0xfa | (if (sch.crc) 0 else 1)).toByte // sync+MPEG1+LayerIII
      frame(2) = ((sch.bi(f) << 4) | (sch.srIdx << 2) | (sch.pad(f) << 1)).toByte
      val mode = if (sch.stereo) 0 else 3 // 00 stereo, 11 single-channel
      frame(3) = ((mode << 6) | 0x04).toByte // original=1, emphasis none
      var o = 4
      if (sch.crc) o += 2 // CRC written after side info is known
      val sideStart = o
      (0 until sch.sideBytes).foreach { j =>
        frame(o) = ((id + f + j) % 200).toByte; o += 1
      }
      if (sch.crc) {
        // CRC covers header bytes 2-3 then the side info (11172-3 §2.4.3.1)
        val tmp = new Array[Byte](2 + sch.sideBytes)
        tmp(0) = frame(2); tmp(1) = frame(3)
        System.arraycopy(frame, sideStart, tmp, 2, sch.sideBytes)
        val c = crc16(tmp, 0, tmp.length)
        frame(4) = ((c >> 8) & 0xff).toByte
        frame(5) = (c & 0xff).toByte
      }
      if (f == 0 && !sch.cbr) { // Xing VBR block: tag, flags=3, frames, bytes
        val x = Array[Int]('X', 'i', 'n', 'g', 0, 0, 0, 3,
          (sch.nFrames >> 24) & 0xff, (sch.nFrames >> 16) & 0xff,
          (sch.nFrames >> 8) & 0xff, sch.nFrames & 0xff,
          (sch.streamBytes >> 24) & 0xff, (sch.streamBytes >> 16) & 0xff,
          (sch.streamBytes >> 8) & 0xff, sch.streamBytes & 0xff)
        x.foreach { b => frame(o) = b.toByte; o += 1 }
      }
      var j = 0
      while (o < len) { // mod-251 filler: never 0xFF, so never a fake sync
        frame(o) = ((id * 131 + f * 17 + j * 7) % 251).toByte
        o += 1; j += 1
      }
      out.write(frame)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- demux

  /** One parsed frame header. */
  private[ops] final case class FrameInfo(
      idx: Int, kbps: Int, pad: Int, crcPresent: Boolean, len: Int)

  /** The demux result: per-frame headers plus stream-level facts. */
  private[ops] final case class Mp3Info(
      frames: Vector[FrameInfo], sr: Int, channels: Int,
      streamBytes: Long, xingFrames: Long)

  /** One decoded, VALIDATED header. `len` is the full frame length. */
  private[ops] final case class Header(
      bi: Int, srIdx: Int, pad: Int, crcPresent: Boolean, channels: Int, len: Int)

  /** Offset of the first frame sync: ID3v2 skipped via its SYNCSAFE size,
    * then a byte scan to 0xFFE. Shared by [[demux]] and [[trimFrames]] so
    * the two walks cannot drift. */
  private[ops] def firstSync(bytes: Array[Byte]): Int = {
    var p = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      p = 10 + size
    }
    while (p + 1 < bytes.length &&
        !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xe0) == 0xe0)) p += 1
    require(p + 4 <= bytes.length, "no MP3 frame sync found")
    p
  }

  /** Validated header decode at offset p — every malformed codepoint
    * (free-format / bad bitrate, reserved sample rate, wrong version or
    * layer, truncation, overrun) throws rather than yielding a zero or
    * out-of-range frame length. Shared by both walkers: an unvalidated
    * walk over a free-format header (len = 0 + pad) would otherwise spin
    * an executor forever. */
  private[ops] def headerAt(bytes: Array[Byte], p: Int, idx: Int): Header = {
    require(p + 4 <= bytes.length, s"truncated header at $p")
    val b1 = bytes(p + 1) & 0xff
    require((bytes(p) & 0xff) == 0xff && (b1 & 0xe0) == 0xe0, s"lost sync at $p")
    require((b1 >> 3) % 4 == 3, "not MPEG-1")
    require((b1 >> 1) % 4 == 1, "not Layer III")
    val b2 = bytes(p + 2) & 0xff
    val bi = b2 >> 4
    val srIdx = (b2 >> 2) & 3
    require(bi >= 1 && bi <= 14, s"bad bitrate index $bi")
    require(srIdx != 3, "reserved sample-rate index")
    val pad = (b2 >> 1) & 1
    val mode = (bytes(p + 3) & 0xff) >> 6
    val ch = if (mode == 3) 1 else 2
    val len = 144000 * BitrateKbps(bi) / SampleRate(srIdx) + pad
    require(p + len <= bytes.length, s"frame $idx overruns the stream")
    Header(bi, srIdx, pad, (b1 & 1) == 0, ch, len)
  }

  /** Walk real MP3 bytes: skip ID3v2 (syncsafe size), resync to 0xFFE,
    * then step frame headers to the end, verifying CRC-16 on protected
    * frames and pulling the Xing block out of frame 0's payload. Throws
    * on any malformed header, CRC mismatch, or a frame walk that does not
    * land exactly on end-of-stream — an audit, not a salvage. */
  private[ops] def demux(bytes: Array[Byte]): Mp3Info = {
    val first = firstSync(bytes)
    var p = first

    val frames = Vector.newBuilder[FrameInfo]
    var idx = 0
    var sr = 0
    var channels = 0
    var xingFrames = -1L
    while (p < bytes.length) {
      val h = headerAt(bytes, p, idx)
      val crcPresent = h.crcPresent
      val bi = h.bi
      if (idx == 0) { sr = SampleRate(h.srIdx); channels = h.channels }
      else require(sr == SampleRate(h.srIdx) && channels == h.channels,
        "sample rate / channel mode changed mid-stream")
      val len = h.len
      val side = if (h.channels == 1) 17 else 32
      var o = p + 4
      if (crcPresent) {
        val stored = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
        val tmp = new Array[Byte](2 + side)
        tmp(0) = bytes(p + 2); tmp(1) = bytes(p + 3)
        System.arraycopy(bytes, o + 2, tmp, 2, side)
        require(crc16(tmp, 0, tmp.length) == stored, s"CRC mismatch in frame $idx")
        o += 2
      }
      o += side
      if (idx == 0 && o + 16 <= p + len &&
          bytes(o) == 'X' && bytes(o + 1) == 'i' && bytes(o + 2) == 'n' && bytes(o + 3) == 'g') {
        val flags = ((bytes(o + 4) & 0xff) << 24) | ((bytes(o + 5) & 0xff) << 16) |
          ((bytes(o + 6) & 0xff) << 8) | (bytes(o + 7) & 0xff)
        if ((flags & 1) != 0)
          xingFrames = ((bytes(o + 8) & 0xffL) << 24) | ((bytes(o + 9) & 0xffL) << 16) |
            ((bytes(o + 10) & 0xffL) << 8) | (bytes(o + 11) & 0xffL)
      }
      frames += FrameInfo(idx, BitrateKbps(bi), h.pad, crcPresent, len)
      idx += 1
      p += len
    }
    require(p == bytes.length, "frame walk did not land on end-of-stream")
    Mp3Info(frames.result(), sr, channels, (bytes.length - first).toLong, xingFrames)
  }

  // -------------------------------------------------------------- trim

  /** Frame-accurate trim WITHOUT re-encode — the mp3splt/ffmpeg `-c copy`
    * operation: walk the frame grid, keep the frames whose index satisfies
    * `keep`, and concatenate their original bytes (each MPEG audio frame is
    * a self-delimiting unit at this layer). Structural caveat, as in the
    * real tools: Layer III's bit reservoir may back-reference main data
    * from a dropped frame at the cut-in point — a decoder conceals the
    * first granules; the FRAMING of the output is exact, which is what the
    * audit (a re-demux through [[demux]]) checks. */
  private[ops] def trimFrames(bytes: Array[Byte], keep: Int => Boolean): Array[Byte] = {
    var p = firstSync(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var idx = 0
    while (p < bytes.length) {
      // the shared validated decode: free-format (len 0), reserved
      // codepoints, and overruns all throw instead of looping or crashing
      val h = headerAt(bytes, p, idx)
      if (keep(idx)) out.write(bytes, p, h.len)
      idx += 1
      p += h.len
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ queries

  /** Closed-form frame schedule in DuckDB SQL — mirrors [[Schedule]]. */
  private val OracleCte: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |f AS (SELECT doc_id, u.f,
      |    CASE WHEN doc_id % 4 = 0 THEN 1 + (doc_id % 14)
      |         ELSE 1 + ((doc_id * 7 + u.f * 5) % 14) END AS bi,
      |    (doc_id + u.f) % 2 AS pad,
      |    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS sr
      |  FROM d, range(0, 13) u(f) WHERE u.f < 6 + (doc_id % 7)),
      |fr AS (SELECT doc_id, f, sr, pad,
      |    list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320], bi) AS kbps,
      |    bi
      |  FROM f)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- MP3 frame-header demux audit ----
    // Spark synthesizes a real framed MPEG-1 Layer III stream per document
    // (ID3v2 / junk prefixes, CRC-16-protected frames, VBR Xing block) and
    // WALKS THE BYTES BACK — every reported column comes from parsed
    // headers; the oracle recomputes the schedule closed-form. A syncsafe,
    // frame-length, CRC, or Xing defect on either side breaks the hashes.
    Q("q299_mp3_frames",
      s"""$OracleCte
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(max(sr) AS BIGINT) AS sample_rate,
         |  CAST(CASE WHEN doc_id % 2 = 1 THEN 2 ELSE 1 END AS BIGINT) AS channels,
         |  CAST((count(*) * 1152000) // max(sr) AS BIGINT) AS duration_ms,
         |  CAST(sum((144000 * kbps) // sr + pad) AS BIGINT) AS stream_bytes,
         |  CAST(sum(kbps) AS BIGINT) AS kbps_sum,
         |  CAST(CASE WHEN count(DISTINCT bi) > 1 THEN 1 ELSE 0 END AS BIGINT) AS vbr,
         |  CAST(CASE WHEN doc_id % 3 = 0 THEN count(*) ELSE 0 END AS BIGINT) AS crc_frames,
         |  CAST(sum(pad) AS BIGINT) AS pad_frames,
         |  CAST(CASE WHEN doc_id % 4 = 0 THEN -1 ELSE count(*) END AS BIGINT) AS xing_frames
         |FROM fr GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions(_.map { id =>
          val info = demux(mp3Bytes(id))
          val fs = info.frames
          (id, fs.size.toLong, info.sr.toLong, info.channels.toLong,
            fs.size.toLong * 1152000L / info.sr,
            fs.map(_.len.toLong).sum,
            fs.map(_.kbps.toLong).sum,
            if (fs.map(_.kbps).distinct.size > 1) 1L else 0L,
            fs.count(_.crcPresent).toLong,
            fs.map(_.pad.toLong).sum,
            info.xingFrames)
        })
        .toDF("doc_id", "n_frames", "sample_rate", "channels", "duration_ms",
          "stream_bytes", "kbps_sum", "vbr", "crc_frames", "pad_frames",
          "xing_frames")
        .orderBy(col("doc_id"))
    },

    // ---- frame-accurate trim (no re-encode) ----
    // Keep the middle third of each clip BY FRAME WALK — the segmentation
    // primitive audio curation needs (cut N-second windows out of crawl
    // audio without decoding). The trimmed bytes are RE-DEMUXED through
    // the strict parser, so every reported fact comes from the parsed
    // output stream; the oracle recomputes the kept-frame window
    // closed-form. A trim that sliced mid-frame would fail the re-demux.
    Q("q301_mp3_trim",
      s"""$OracleCte
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST((count(*) * 1152000) // max(sr) AS BIGINT) AS duration_ms,
         |  CAST(sum((144000 * kbps) // sr + pad) AS BIGINT) AS stream_bytes,
         |  CAST(sum(kbps) AS BIGINT) AS kbps_sum
         |FROM fr
         |WHERE f >= (6 + (doc_id % 7)) // 3 AND f < (2 * (6 + (doc_id % 7))) // 3
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions(_.map { id =>
          val full = mp3Bytes(id)
          val n = Schedule(id).nFrames
          val info = demux(trimFrames(full, f => f >= n / 3 && f < 2 * n / 3))
          val fs = info.frames
          (id, fs.size.toLong, fs.size.toLong * 1152000L / info.sr,
            fs.map(_.len.toLong).sum, fs.map(_.kbps.toLong).sum)
        })
        .toDF("doc_id", "n_frames", "duration_ms", "stream_bytes", "kbps_sum")
        .orderBy(col("doc_id"))
    }
  )
}
