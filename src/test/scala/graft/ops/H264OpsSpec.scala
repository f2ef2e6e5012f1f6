package graft.ops

import graft.SparkSpec

/** H.264 Annex B demux: Exp-Golomb must round-trip, emulation prevention
  * must escape/de-escape byte-exactly (including planted 00 00 0x runs),
  * the NAL walk must handle mixed 3-/4-byte start codes, the slice parse
  * must read frame_num at the SPS-declared width, and the q300 audit must
  * survive the full Spark path at sf0.001. */
class H264OpsSpec extends SparkSpec {

  test("Exp-Golomb ue/se round-trips over the interesting range") {
    val w = new H264Ops.BitWriter
    val ues = (0 to 300) ++ Seq(1000, 65535)
    val ses = (-200 to 200) ++ Seq(-32768, 32767)
    ues.foreach(w.ue)
    ses.foreach(w.se)
    val r = new H264Ops.BitReader(w.bytes())
    ues.foreach(v => assert(r.ue() === v, s"ue($v)"))
    ses.foreach(v => assert(r.se() === v, s"se($v)"))
  }

  test("emulation prevention escapes and de-escapes byte-exactly") {
    // every class of event: 00 00 00, 00 00 01, 00 00 02, 00 00 03, and
    // a run of zeros long enough to need TWO escapes, plus non-events
    val cases = Seq[Array[Int]](
      Array(0, 0, 0), Array(0, 0, 1), Array(0, 0, 2), Array(0, 0, 3),
      Array(0, 0, 0, 0, 0, 0, 1), Array(0, 0, 4), Array(1, 0, 0),
      Array(0, 0, 0, 1, 0, 0, 2), Array(255, 0, 0, 3, 3, 0, 0))
    cases.foreach { c =>
      val rbsp = c.map(_.toByte)
      val esc = H264Ops.escapeRbsp(rbsp)
      // no escaped NAL may contain 00 00 00 / 00 00 01 / 00 00 02 —
      // 00 00 03 is legitimately present: it IS the escape (§7.4.1.1)
      esc.sliding(3).foreach { w =>
        if (w.length == 3)
          assert(!(w(0) == 0 && w(1) == 0 && (w(2) & 0xff) <= 2),
            s"unescaped triple in ${esc.map(_ & 0xff).mkString(",")}")
      }
      val back = H264Ops.unescapeRbsp(esc, 0, esc.length)
      assert(back.toSeq === rbsp.toSeq, s"case ${c.mkString(",")}")
    }
  }

  test("demux round-trips the schedule for a spread of doc_ids") {
    (0L to 59L).foreach { id =>
      val sch = H264Ops.Schedule(id)
      val i = H264Ops.demux(H264Ops.h264Bytes(id))
      assert(i.width === sch.wMbs * 16L, s"doc $id width")
      assert(i.height === sch.hMbs * 16L, s"doc $id height")
      assert(i.levelIdc === sch.levelIdc.toLong, s"doc $id level")
      assert(i.nNals === sch.nSlices + 2L, s"doc $id nals")
      val idrs = (0 until sch.nSlices).count(sch.isIdr)
      assert(i.nIdr === idrs.toLong, s"doc $id idr count")
      assert(i.nP === (sch.nSlices - idrs).toLong, s"doc $id p count")
      assert(i.qpInit === 26L + sch.qpMinus26, s"doc $id qp")
      assert(i.sumFrameNum === (0 until sch.nSlices).map(_.toLong).sum, s"doc $id frame_num")
      val chk = (for {
        s <- 0 until sch.nSlices
        j <- 0 until sch.payloadLen(s)
      } yield (j + 1).toLong * sch.payloadByte(s, j)).sum
      assert(i.payloadChk === chk, s"doc $id payload checksum")
    }
  }

  test("every synthesized slice exercises emulation prevention") {
    // the schedule pins payload byte 2 ≤ 3 after a 00 00 pair, so EVERY
    // slice NAL must carry at least one real 0x03 insertion — the escaped
    // NAL is strictly longer than its RBSP
    (0L to 59L).foreach { id =>
      val bytes = H264Ops.h264Bytes(id)
      val sch = H264Ops.Schedule(id)
      val slices = H264Ops.nalUnits(bytes).filter { case (off, _) =>
        val t = bytes(off) & 0x1f; t == 5 || t == 1
      }
      assert(slices.size === sch.nSlices)
      slices.foreach { case (off, len) =>
        val rbsp = H264Ops.unescapeRbsp(bytes, off + 1, off + len)
        assert(rbsp.length < len - 1,
          s"doc $id slice at $off has no EPB event")
      }
    }
  }

  test("a set forbidden_zero_bit and a corrupted trailer fail loudly") {
    val bytes = H264Ops.h264Bytes(1L)
    val bad = bytes.clone()
    // first NAL header byte (after the 4-byte start code) with bit 7 set
    bad(4) = (bad(4) | 0x80).toByte
    assert(intercept[IllegalArgumentException](H264Ops.demux(bad))
      .getMessage.contains("forbidden"))
    val noTrailer = bytes.clone()
    noTrailer(noTrailer.length - 1) = 0x55 // last slice's 0x80 trailer
    assert(intercept[IllegalArgumentException](H264Ops.demux(noTrailer))
      .getMessage.contains("trailer"))
  }

  test("gopCut keeps SPS/PPS plus exactly the last-IDR-led GOP") {
    (0L to 23L).foreach { id =>
      val sch = H264Ops.Schedule(id)
      val i = H264Ops.demux(H264Ops.gopCut(H264Ops.h264Bytes(id)))
      val lastIdr = 4 * ((sch.nSlices - 1) / 4)
      assert(i.nIdr === 1L, s"doc $id must keep exactly one IDR")
      assert(i.nP === (sch.nSlices - lastIdr - 1).toLong, s"doc $id P count")
      assert(i.width === sch.wMbs * 16L, s"doc $id SPS survived the cut")
      assert(i.qpInit === 26L + sch.qpMinus26, s"doc $id PPS survived the cut")
      assert(i.sumFrameNum === (lastIdr until sch.nSlices).map(_.toLong).sum,
        s"doc $id kept frame_nums")
      val chk = (for {
        s <- lastIdr until sch.nSlices
        j <- 0 until sch.payloadLen(s)
      } yield (j + 1).toLong * sch.payloadByte(s, j)).sum
      assert(i.payloadChk === chk, s"doc $id kept payload checksum")
    }
  }

  test("q300 runs end-to-end and its facts match the schedule") {
    val rows = graft.SparkEntry.queries("q300_h264_demux")(spark, sf001).collect()
    assert(rows.length === 500)
    rows.take(40).foreach { r =>
      val sch = H264Ops.Schedule(r.getLong(0))
      assert(r.getLong(1) === sch.wMbs * 16L)
      assert(r.getLong(2) === sch.hMbs * 16L)
      assert(r.getLong(4) === sch.nSlices + 2L)
    }
  }
}
