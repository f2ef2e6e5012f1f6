package graft.ops

import graft.SparkSpec

/** MP3 frame demux: the synthesized MPEG-1 Layer III stream must walk back
  * exactly per its schedule, the CRC-16 must catch corruption in the
  * protected region, the ID3v2 syncsafe skip and junk resync must land on
  * the true first frame, and the q299 audit must survive the full Spark
  * path at sf0.001. */
class Mp3OpsSpec extends SparkSpec {

  test("demux round-trips the schedule for a spread of doc_ids") {
    // cover every prefix posture (id%5), CRC posture (id%3), CBR/VBR
    // (id%4), channel mode (id%2), and all three sample rates
    (0L to 61L).foreach { id =>
      val sch = Mp3Ops.Schedule(id)
      val info = Mp3Ops.demux(Mp3Ops.mp3Bytes(id))
      assert(info.frames.size === sch.nFrames, s"doc $id frame count")
      assert(info.sr === sch.sr, s"doc $id sample rate")
      assert(info.channels === (if (sch.stereo) 2 else 1), s"doc $id channels")
      info.frames.foreach { fi =>
        assert(fi.kbps === Mp3Ops.BitrateKbps(sch.bi(fi.idx)), s"doc $id frame ${fi.idx} kbps")
        assert(fi.pad === sch.pad(fi.idx), s"doc $id frame ${fi.idx} pad")
        assert(fi.len === sch.frameLen(fi.idx), s"doc $id frame ${fi.idx} len")
        assert(fi.crcPresent === sch.crc, s"doc $id frame ${fi.idx} crc flag")
      }
      assert(info.streamBytes === sch.streamBytes.toLong, s"doc $id stream bytes")
      assert(info.xingFrames === (if (sch.cbr) -1L else sch.nFrames.toLong),
        s"doc $id xing")
    }
  }

  test("CRC-16 catches a flipped byte in the protected side info") {
    // id 0: CRC posture (0 % 3 == 0), ID3 prefix (0 % 5 == 0)
    val bytes = Mp3Ops.mp3Bytes(0L)
    val clean = Mp3Ops.demux(bytes) // sanity: clean stream parses
    assert(clean.frames.forall(_.crcPresent))
    // find the first frame sync (after the ID3 tag) and corrupt a side-info
    // byte — 8 bytes past the header+CRC is inside the 17/32-byte side info
    var p = 0
    while (!((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xe0) == 0xe0)) p += 1
    val corrupt = bytes.clone()
    corrupt(p + 4 + 2 + 8) = (corrupt(p + 4 + 2 + 8) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](Mp3Ops.demux(corrupt))
    assert(e.getMessage.contains("CRC mismatch"))
  }

  test("a corrupted frame header fails the walk loudly") {
    val bytes = Mp3Ops.mp3Bytes(2L) // no prefix, no CRC (2%5=2, 2%3=2)
    // bitrate index 15 (the 'bad' codepoint) in frame 0's header byte 2
    val badBi = bytes.clone()
    badBi(2) = ((0xf << 4) | (badBi(2) & 0x0f)).toByte
    assert(intercept[IllegalArgumentException](Mp3Ops.demux(badBi))
      .getMessage.contains("bitrate"))
    // truncation mid-frame: the walk must not land on end-of-stream
    val truncated = bytes.dropRight(3)
    intercept[IllegalArgumentException](Mp3Ops.demux(truncated))
  }

  test("ID3v2 syncsafe skip and junk resync both land on the true sync") {
    val tagged = Mp3Ops.demux(Mp3Ops.mp3Bytes(5L)) // 5%5=0 → ID3 prefix
    assert(tagged.frames.nonEmpty)
    val junked = Mp3Ops.demux(Mp3Ops.mp3Bytes(6L)) // 6%5=1 → junk prefix
    assert(junked.frames.nonEmpty)
    // the schedule's byte totals confirm the parse began at the true sync
    assert(tagged.streamBytes === Mp3Ops.Schedule(5L).streamBytes.toLong)
    assert(junked.streamBytes === Mp3Ops.Schedule(6L).streamBytes.toLong)
  }

  test("trimFrames keeps exactly the selected frames, byte-identically") {
    (0L to 23L).foreach { id =>
      val sch = Mp3Ops.Schedule(id)
      val full = Mp3Ops.mp3Bytes(id)
      // middle third — the q301 window
      val lo = sch.nFrames / 3; val hi = 2 * sch.nFrames / 3
      val trimmed = Mp3Ops.demux(Mp3Ops.trimFrames(full, f => f >= lo && f < hi))
      assert(trimmed.frames.size === hi - lo, s"doc $id kept count")
      trimmed.frames.zipWithIndex.foreach { case (fi, k) =>
        assert(fi.kbps === Mp3Ops.BitrateKbps(sch.bi(lo + k)), s"doc $id frame $k")
        assert(fi.len === sch.frameLen(lo + k), s"doc $id frame $k len")
      }
      // sparse selection also re-demuxes cleanly (every-other-frame)
      val sparse = Mp3Ops.demux(Mp3Ops.trimFrames(full, _ % 2 == 0))
      assert(sparse.frames.size === (sch.nFrames + 1) / 2, s"doc $id sparse")
    }
  }

  test("trimFrames validates headers — free format throws, never loops") {
    val bytes = Mp3Ops.mp3Bytes(2L) // frame 0 at offset 0 (no prefix)
    val free = bytes.clone()
    // bitrate index 0 = free format: an unvalidated walk would compute
    // len = 0 + pad and spin forever; the shared headerAt must throw
    free(2) = (free(2) & 0x0f).toByte
    assert(intercept[IllegalArgumentException](
      Mp3Ops.trimFrames(free, _ => true)).getMessage.contains("bitrate"))
    // and a mid-frame truncation must throw (overrun), not read past end
    intercept[IllegalArgumentException](
      Mp3Ops.trimFrames(bytes.dropRight(3), _ => true))
  }

  test("q299 runs end-to-end and its facts match the schedule") {
    val rows = graft.SparkEntry.queries("q299_mp3_frames")(spark, sf001).collect()
    assert(rows.length === 500)
    rows.take(40).foreach { r =>
      val sch = Mp3Ops.Schedule(r.getLong(0))
      assert(r.getLong(1) === sch.nFrames.toLong)
      assert(r.getLong(4) === sch.nFrames.toLong * 1152000L / sch.sr)
      assert(r.getLong(5) === sch.streamBytes.toLong)
    }
  }
}
