package graft.ops


import java.nio.{ByteBuffer, ByteOrder}
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * processed per-partition through a typed Dataset (SURVEY.md north star).
  *
  * No image/audio *codecs* ship in this container, so payloads are
  * synthesized — but synthesis and decode are both REAL container-format
  * code, pure JVM: payloads are well-formed PNG (magic + IHDR chunk with a
  * valid CRC-32), WAV (RIFF/fmt/data chunks, little-endian), and MP4
  * (ISO-BMFF ftyp/moov/mvhd/mdat boxes, big-endian), and the decode step
  * parses those headers back — modality is detected from magic bytes,
  * width/height read from IHDR (CRC-verified), duration computed from the
  * fmt byte rate / mvhd timescale. A broken parser fails the oracle check
  * because the synthesized header fields are deterministic in (doc_id,
  * text length). Frame-level decoding (pixels/samples) is the one step
  * that would need a codec library; its seam is the same `mapPartitions`
  * iterator where a codec instance would be initialized once per
  * partition, not per row.
  *
  * At 100 TB: payloads stay where they are scanned (no shuffle — this is a
  * pure map), `spark.sql.files.maxPartitionBytes` sizes each task's batch,
  * and decode parallelism = partition count across executors.
  */
object Multimodal {

  /** Input projection: a binary media payload keyed by document. */
  final case class BinDoc(doc_id: Long, payload: Array[Byte])

  /** Extracted metadata row. */
  final case class MediaMeta(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_s: Double)

  // ---------------------------------------------------------------- synth

  private val PngMagic = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** Well-formed PNG prefix: magic + IHDR (13-byte payload, real CRC-32
    * over type+data, per the PNG spec) followed by the body bytes standing
    * in for the IDAT stream. */
  def pngBytes(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val ihdrData = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII"))
    crc.update(ihdrData)
    ByteBuffer.allocate(8 + 4 + 4 + 13 + 4 + body.length).order(ByteOrder.BIG_ENDIAN)
      .put(PngMagic)
      .putInt(13).put("IHDR".getBytes("US-ASCII")).put(ihdrData)
      .putInt(crc.getValue.toInt)
      .put(body)
      .array()
  }

  /** Well-formed PCM WAV: RIFF header + 16-byte fmt chunk + data chunk,
    * all little-endian per the RIFF spec. */
  def wavBytes(sampleRate: Int, bitsPerSample: Int, channels: Int,
      body: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    ByteBuffer.allocate(44 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(body.length)
      .put(body)
      .array()
  }

  /** Minimal ISO-BMFF (MP4) file: ftyp box, moov box containing a
    * version-0 mvhd (timescale + duration), and an mdat box with the body. */
  def mp4Bytes(timescale: Int, duration: Int, body: Array[Byte]): Array[Byte] = {
    val mvhd = ByteBuffer.allocate(108).order(ByteOrder.BIG_ENDIAN)
      .putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)          // version 0 + flags
      .putInt(0).putInt(0) // creation/modification time
      .putInt(timescale).putInt(duration)
      .putInt(0x00010000)  // rate 1.0
      .putShort(0x0100.toShort).putShort(0.toShort) // volume + reserved
      .putInt(0).putInt(0) // reserved
      .putInt(0x00010000).putInt(0).putInt(0) // matrix (identity)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // pre_defined
      .putInt(2)           // next_track_ID
      .array()
    ByteBuffer.allocate(16 + 8 + 108 + 8 + body.length).order(ByteOrder.BIG_ENDIAN)
      .putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
      .putInt(8 + 108).put("moov".getBytes("US-ASCII")).put(mvhd)
      .putInt(8 + body.length).put("mdat".getBytes("US-ASCII")).put(body)
      .array()
  }

  /** Deterministic payload for a document: the text bytes wrapped in a real
    * container whose kind cycles by doc_id. Header fields are functions of
    * the body length, so the oracle can state the expected parse results. */
  def synthesize(id: Long, body: Array[Byte]): Array[Byte] = {
    val nb = body.length
    (id % 3) match {
      case 0 => pngBytes((64 + nb % 128), (64 + (nb * 7) % 128), body)
      // sampleRate 16 Hz × 1 ch × 8 bit → byteRate 16 → duration = nb/16 s
      case 1 => wavBytes(16, 8, 1, body)
      // timescale 16, duration ticks = nb → nb/16 s
      case _ => mp4Bytes(16, nb, body)
    }
  }

  // ---------------------------------------------------------------- parse

  private def ascii(b: Array[Byte], off: Int, len: Int) =
    new String(b, off, len, "US-ASCII")

  /** Real decode step: detect the container by magic bytes and parse its
    * header — PNG IHDR (CRC-verified), WAV fmt/data, MP4 mvhd/mdat. */
  def parseMeta(id: Long, payload: Array[Byte]): MediaMeta = {
    if (payload.length >= 8 && payload.take(8).sameElements(PngMagic)) {
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      val len = bb.getInt(8)
      require(ascii(payload, 12, 4) == "IHDR", "first PNG chunk must be IHDR")
      val crc = new java.util.zip.CRC32()
      crc.update(payload, 12, 4 + len)
      require(crc.getValue.toInt == bb.getInt(16 + len), "IHDR CRC mismatch")
      MediaMeta(id, "image", (payload.length - (33)).toLong,
        width = bb.getInt(16), height = bb.getInt(20), duration_s = 0.0)
    } else if (payload.length >= 12 && ascii(payload, 0, 4) == "RIFF"
        && ascii(payload, 8, 4) == "WAVE") {
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      // walk RIFF chunks for fmt and data
      var off = 12
      var byteRate = 0
      var dataLen = -1L
      while (off + 8 <= payload.length && (byteRate == 0 || dataLen < 0)) {
        val ckId = ascii(payload, off, 4)
        val ckLen = bb.getInt(off + 4)
        if (ckId == "fmt ") byteRate = bb.getInt(off + 16)
        else if (ckId == "data") dataLen = ckLen.toLong
        off += 8 + ckLen
      }
      require(byteRate > 0 && dataLen >= 0, "WAV missing fmt/data chunk")
      MediaMeta(id, "audio", dataLen, 0, 0, dataLen.toDouble / byteRate)
    } else if (payload.length >= 8 && ascii(payload, 4, 4) == "ftyp") {
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      // walk top-level boxes; inside moov, find mvhd
      var off = 0
      var timescale = 0; var durTicks = 0L; var dataLen = -1L
      while (off + 8 <= payload.length) {
        val size = bb.getInt(off)
        val kind = ascii(payload, off + 4, 4)
        if (kind == "moov") {
          var in = off + 8
          while (in + 8 <= off + size) {
            val s2 = bb.getInt(in)
            if (ascii(payload, in + 4, 4) == "mvhd") {
              timescale = bb.getInt(in + 20) // ver/flags+ctime+mtime = 12
              durTicks = bb.getInt(in + 24).toLong
            }
            in += s2
          }
        } else if (kind == "mdat") dataLen = (size - 8).toLong
        off += size
      }
      require(timescale > 0 && dataLen >= 0, "MP4 missing mvhd/mdat box")
      MediaMeta(id, "video", dataLen, 0, 0, durTicks.toDouble / timescale)
    } else sys.error(s"unknown container for doc $id")
  }

  /** Media transform: image → half-resolution thumbnail (every-other-byte
    * body sample + halved IHDR dims, re-encoded as a valid PNG), audio /
    * video → first-4-seconds clip (data/mdat truncated to 4 s of payload
    * at the container's rate). Real byte surgery through the same
    * builders; the caller re-parses the output, so a broken transform
    * fails the parser round-trip. */
  def thumbnail(id: Long, payload: Array[Byte]): Array[Byte] = {
    val m = parseMeta(id, payload)
    m.modality match {
      case "image" =>
        val body = payload.drop(33) // magic(8) + IHDR chunk(25)
        val half = Array.tabulate((body.length + 1) / 2)(i => body(2 * i))
        pngBytes(math.max(m.width / 2, 1), math.max(m.height / 2, 1), half)
      case "audio" =>
        val body = payload.drop(44) // RIFF+fmt+data headers
        wavBytes(16, 8, 1, body.take(64)) // 4 s at 16 B/s
      case _ =>
        val body = payload.drop(16 + 8 + 108 + 8) // ftyp+moov/mvhd+mdat hdr
        val clip = body.take(64) // 4 s at timescale 16
        mp4Bytes(16, clip.length, clip)
    }
  }

  val qs: Seq[Q] = Seq(
    // The oracle states the synthesized header fields directly (they are
    // deterministic in doc_id and text length); Spark round-trips real
    // bytes: synthesize container → parse header → metadata. Any parser
    // or synthesizer defect breaks the hash match.
    Q("q50_multimodal_meta",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |       THEN 64 + octet_length(encode(text)) % 128 ELSE 0 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |       THEN 64 + (octet_length(encode(text)) * 7) % 128 ELSE 0 END AS INTEGER) AS height,
        |  round(CASE WHEN doc_id % 3 = 0 THEN 0.0
        |       ELSE octet_length(encode(text)) / 16.0 END, 4) AS duration_s
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.functions.{col, round}
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[BinDoc]
        // payload synthesis: text bytes → real container bytes
        .mapPartitions(_.map(d => BinDoc(d.doc_id, synthesize(d.doc_id, d.payload))))
        // decode: parse container headers back (codec-init-per-partition seam)
        .mapPartitions(_.map(d => parseMeta(d.doc_id, d.payload)))
        .toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          col("width"), col("height"), round(col("duration_s"), 4).as("duration_s"))
        .orderBy(col("doc_id"))
    },

    // ---- media transform: thumbnail / clip (resize + frame-sample) ----
    // synthesize → thumbnail (real byte surgery) → re-parse: the emitted
    // fields come from parsing the TRANSFORMED container, so the oracle
    // (which states the expected header fields from the formulas) checks
    // synthesis, transform, and parser together. Pure map over binary
    // columns — no shuffle, codec-per-partition seam as in q50.
    Q("q78_multimodal_thumb",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS modality,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN ceil(octet_length(encode(text)) / 2.0)
        |       ELSE least(octet_length(encode(text)), 64) END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |       THEN floor((64 + octet_length(encode(text)) % 128) / 2.0)
        |       ELSE 0 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |       THEN floor((64 + (octet_length(encode(text)) * 7) % 128) / 2.0)
        |       ELSE 0 END AS INTEGER) AS height,
        |  round(CASE WHEN doc_id % 3 = 0 THEN 0.0
        |       ELSE least(octet_length(encode(text)), 64) / 16.0 END, 4) AS duration_s
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.functions.{col, round}
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[BinDoc]
        .mapPartitions(_.map(d => BinDoc(d.doc_id, synthesize(d.doc_id, d.payload))))
        .mapPartitions(_.map(d => BinDoc(d.doc_id, thumbnail(d.doc_id, d.payload))))
        .mapPartitions(_.map(d => parseMeta(d.doc_id, d.payload)))
        .toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          col("width"), col("height"), round(col("duration_s"), 4).as("duration_s"))
        .orderBy(col("doc_id"))
    }
  )
}
