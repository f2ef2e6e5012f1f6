package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Container synthesis/parse round-trip: the decode step is real header
  * parsing (PNG IHDR + CRC, WAV RIFF chunks, MP4 ISO-BMFF boxes), not an
  * id-derived fake — a corrupted header must be rejected, and externally
  * well-formed bytes must parse. */
class MultimodalSpec extends AnyFunSuite {

  private val body = "hello multimodal world".getBytes("UTF-8")

  test("PNG round-trip: dimensions from IHDR, CRC verified") {
    val png = Multimodal.pngBytes(640, 480, body)
    val m = Multimodal.parseMeta(7L, png)
    assert(m.modality == "image")
    assert(m.width == 640 && m.height == 480)
    assert(m.n_bytes == body.length)
    assert(m.duration_s == 0.0)
    // javax.imageio agrees the header is a real PNG (no codec needed to
    // read dimensions from a valid IHDR)
    val img = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(png))
    val readers = javax.imageio.ImageIO.getImageReaders(img)
    assert(readers.hasNext, "ImageIO should recognize the PNG signature")
    val r = readers.next()
    r.setInput(img)
    assert(r.getWidth(0) == 640 && r.getHeight(0) == 480)
  }

  test("PNG with corrupted CRC is rejected") {
    val png = Multimodal.pngBytes(640, 480, body)
    png(29) = (png(29) ^ 0xff).toByte // flip a CRC byte
    assertThrows[IllegalArgumentException](Multimodal.parseMeta(7L, png))
  }

  test("WAV round-trip: duration from fmt byte rate and data size") {
    val wav = Multimodal.wavBytes(16000, 16, 2, body)
    val m = Multimodal.parseMeta(8L, wav)
    assert(m.modality == "audio")
    assert(m.n_bytes == body.length)
    // byteRate = 16000*2*16/8 = 64000
    assert(math.abs(m.duration_s - body.length / 64000.0) < 1e-12)
    // the JDK's own sound API parses the same header
    val afmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(wav))
    assert(afmt.getFormat.getSampleRate == 16000f)
    assert(afmt.getFormat.getChannels == 2)
  }

  test("MP4 round-trip: duration from mvhd timescale/ticks, bytes from mdat") {
    val mp4 = Multimodal.mp4Bytes(timescale = 1000, duration = 2500, body)
    val m = Multimodal.parseMeta(9L, mp4)
    assert(m.modality == "video")
    assert(m.n_bytes == body.length)
    assert(math.abs(m.duration_s - 2.5) < 1e-12)
  }

  test("unknown container is rejected") {
    assertThrows[RuntimeException](
      Multimodal.parseMeta(1L, "not a container".getBytes("UTF-8")))
  }

  test("thumbnail halves PNG dims and clips audio/video to 4s, re-parseable") {
    val big = ("x" * 200).getBytes("UTF-8")
    // image: dims halve, body every-other-byte
    val png = Multimodal.thumbnail(0L, Multimodal.synthesize(0L, big))
    val pm = Multimodal.parseMeta(0L, png)
    assert(pm.modality == "image")
    assert(pm.width == (64 + 200 % 128) / 2 && pm.height == (64 + 200 * 7 % 128) / 2)
    assert(pm.n_bytes == 100)
    // audio: clipped to 64 bytes = 4 s at 16 B/s
    val wav = Multimodal.thumbnail(1L, Multimodal.synthesize(1L, big))
    val wm = Multimodal.parseMeta(1L, wav)
    assert(wm.modality == "audio" && wm.n_bytes == 64 && wm.duration_s == 4.0)
    // video: mdat + mvhd duration clipped consistently
    val mp4 = Multimodal.thumbnail(2L, Multimodal.synthesize(2L, big))
    val vm = Multimodal.parseMeta(2L, mp4)
    assert(vm.modality == "video" && vm.n_bytes == 64 && vm.duration_s == 4.0)
    // shorter-than-clip input stays whole
    val small = "tiny".getBytes("UTF-8")
    val wm2 = Multimodal.parseMeta(1L, Multimodal.thumbnail(1L, Multimodal.synthesize(1L, small)))
    assert(wm2.n_bytes == 4 && wm2.duration_s == 0.25)
  }

  test("synthesize cycles modality by doc_id and parses back") {
    val ids = Seq(0L, 1L, 2L)
    val metas = ids.map(id => Multimodal.parseMeta(id, Multimodal.synthesize(id, body)))
    assert(metas.map(_.modality) == Seq("image", "audio", "video"))
    assert(metas.forall(_.n_bytes == body.length))
  }
}
