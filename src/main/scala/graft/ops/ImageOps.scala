package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** Frame-level image operators — the pixel half of the multimodal story
  * that [[Multimodal]]'s container parsing deliberately deferred. No
  * external codec is needed: PNG encode is DEFLATE (java.util.zip) +
  * CRC-32 chunks per the PNG spec, and decode is `javax.imageio`'s
  * built-in PNG reader — both ship in the JDK.
  *
  * The pipeline is the production shape for image near-dup at 100 TB:
  *
  *   binary PNG column → decode to pixels (per-partition map, codec
  *   seam) → 8×9 grayscale grid → 64-bit dHash (row-wise gradient) →
  *   Hamming-blocked self-join on 8-bit hash bands (the q65 recipe on
  *   image bits: Hamming ≤ 7 over 8 bands pigeonholes ≥ 1 identical
  *   band, so candidates come from an EQUI-join on (band, byte) —
  *   never an all-pairs scan). Unlike the shingle/minhash band keys,
  *   this key space is BOUNDED (8 bands × 256 byte values), so
  *   candidate volume is Σ df²/2 over band values and the design
  *   stands on the band distribution staying flat: the resample below
  *   covers the WHOLE document (no shared padding tail — a fixed-crop
  *   variant measured 4103/5000 docs in one band bucket, 22.8M
  *   candidate pairs at sf0.1 vs 0.8M for whole-document resampling).
  *   Residual hot band values (a constant image, a boilerplate
  *   template) get the q100/q119 df-cap treatment — at a larger SF,
  *   cap band-value df and adjudicate capped-out docs by a second
  *   pass; documented here rather than gated on by default because the
  *   exactness spec (blocked ≡ brute force) is the property that makes
  *   q143 trustworthy.
  *
  * Correctness is strict, not rows-only: the synthesized image's pixels
  * are a closed-form function of the document text (char codes linearly
  * resampled over its full length), so the DuckDB oracle computes the SAME dHash directly
  * from the formula while Spark goes the long way — synthesize pixels →
  * encode a real PNG → decode it back with javax.imageio → hash the
  * DECODED pixels. PNG is lossless, so any encoder, decoder, or hash
  * defect breaks the hash match.
  *
  * Pixel grid is 9×8 (the classic dHash sampling grid) so the hash reads
  * straight off the decoded image with no resampling step; a production
  * pipeline would first box-downsample the raster to 9×8 inside the same
  * per-partition map. The hash is split hi/lo (rows 0–3 / 4–7, 32 bits
  * each) so both engines stay inside signed BIGINT arithmetic.
  */
object ImageOps {

  /** dHash grid: 9 columns × 8 rows → 8 comparisons × 8 rows = 64 bits. */
  private[ops] val GridW = 9
  private[ops] val GridH = 8

  /** Tall grid for the 128-bit variant: 9 × 16 → 8 × 16 = 128 bits. The
    * extra bits come from more ROWS (not wider rows) so every band stays
    * an 8-bit byte and the packing stays inside 32-bit-per-long — the
    * same sign-safety discipline as the 64-bit hash (a 17-wide grid's
    * 16-bit rows would overflow DuckDB's checked BIGINT products at the
    * top shift). */
  private[ops] val GridH128 = 16

  // ------------------------------------------------------------- synth

  /** Deterministic w×h grayscale grid from a document's text: the cells
    * are a nearest-neighbor LINEAR RESAMPLE of the [a-z ]-sanitized
    * lowercase text — cell i reads char floor(i·L/(w·h)) — exactly how
    * real dHash resizes the whole raster rather than cropping a corner.
    * Covering the full length matters for the blocking join: a fixed
    * stride leaves every shorter-than-stride·cells doc with identical
    * space-padded tail rows, which collapse thousands of docs into one
    * band bucket (measured above). Empty text → all-space grid. The
    * sanitize step is GLOBAL regex replace — the oracle's regexp_replace
    * needs the 'g' flag to match. */
  private[ops] def pixelGridN(text: String, w: Int, h: Int): Array[Int] = {
    val cleaned = Option(text).getOrElse("")
      .toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z ]", "")
    val n = w * h
    Array.tabulate(n) { i =>
      if (cleaned.isEmpty) 32
      else cleaned.charAt((i.toLong * cleaned.length / n).toInt).toInt
    }
  }

  /** The classic 9×8 dHash grid. */
  private[ops] def pixelGrid(text: String): Array[Int] =
    pixelGridN(text, GridW, GridH)

  // ------------------------------------------------------ PNG encode

  private def chunk(kind: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    crc.update(kind.getBytes("US-ASCII"))
    crc.update(data)
    ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
      .putInt(data.length).put(kind.getBytes("US-ASCII")).put(data)
      .putInt(crc.getValue.toInt)
      .array()
  }

  /** A complete, decodable 8-bit grayscale PNG: IHDR + IDAT (zlib-deflated
    * scanlines, filter 0 per row) + IEND. Pure JDK — java.util.zip's
    * Deflater emits the zlib stream the PNG spec requires. */
  def pngEncodeGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, s"pixel buffer ${px.length} != ${w}x$h")
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val raw = new Array[Byte](h * (1 + w)) // filter byte 0 + row pixels
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raw(y * (1 + w) + 1 + x) = px(y * w + x).toByte; x += 1 }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    // drain until finished: a single deflate() call would silently
    // truncate the IDAT when stored-block overhead on a large
    // incompressible raster exceeds a fixed slack
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val magic = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
    magic ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  // ------------------------------------------------------ PNG decode

  /** Decode a PNG to (width, height, grayscale pixels) with the JDK's
    * javax.imageio reader — the real frame-level decode step. */
  def pngDecodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "javax.imageio could not decode the PNG payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    (w, h, Array.tabulate(w * h)(i => raster.getSample(i % w, i / w, 0)))
  }

  // ----------------------------------------------------------- dHash

  /** Row-wise gradient hash over a 9×8 grid: bit (x, y) = p(x,y) < p(x+1,y),
    * packed little-endian within each row byte; returns (rows 0–3, rows
    * 4–7) as two 32-bit-wide longs — sign-safe in both engines. */
  def dHash(px: Array[Int]): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var y = 0
    while (y < GridH) {
      var rb = 0L
      var x = 0
      while (x < GridW - 1) {
        if (px(y * GridW + x) < px(y * GridW + x + 1)) rb |= (1L << x)
        x += 1
      }
      if (y < 4) hi |= rb << (8 * y) else lo |= rb << (8 * (y - 4))
      y += 1
    }
    (hi, lo)
  }

  /** 128-bit dHash over a 9×16 grid: the same row-wise gradient, 16 row
    * bytes packed 4-per-long into (h0, h1, h2, h3) — 32 bits used per
    * long, so every value stays positive and both engines' BIGINT
    * arithmetic is overflow-free. */
  def dHash128(px: Array[Int]): (Long, Long, Long, Long) = {
    val q = new Array[Long](4)
    var y = 0
    while (y < GridH128) {
      var rb = 0L
      var x = 0
      while (x < GridW - 1) {
        if (px(y * GridW + x) < px(y * GridW + x + 1)) rb |= (1L << x)
        x += 1
      }
      q(y / 4) |= rb << (8 * (y % 4))
      y += 1
    }
    (q(0), q(1), q(2), q(3))
  }

  // --------------------------------------------------------- queries

  /** (doc_id, dhash_hi, dhash_lo, rb0..rb7) via the FULL pixel path:
    * synthesize grid → encode real PNG → javax.imageio decode → hash the
    * decoded pixels. Persisted once per (session, dir) — q142 reports it,
    * q143's blocking join reuses it. Row bytes ride along as the band
    * values so the blocking join needs no re-hash. */
  private[graft] def dhashFrame(s: org.apache.spark.sql.SparkSession, dir: String) =
    CacheRegistry.cache(s, s"q142-dhash:$dir") {
      dhashFrameFrom(tSpread(s, dir, "documents"))
    }

  /** [[dhashFrame]] over any (doc_id, text, …) frame — the per-batch
    * map-side hashing step of the streaming composition
    * (StreamingImageDedupSpec) shares it with the batch queries. */
  private[graft] def dhashFrameFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // codec-per-partition seam: a real codec library would be
        // initialized here, once per task, not per row
        it.map { case (id, text) =>
          val png = pngEncodeGray(GridW, GridH, pixelGrid(text))
          val (w, h, px) = pngDecodeGray(png)
          require(w == GridW && h == GridH, s"decode shape $w x $h")
          val (hi, lo) = dHash(px)
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "dhash_hi", "dhash_lo")
  }

  /** (doc_id, h0..h3) via the same full pixel path as [[dhashFrame]], on
    * the TALL 9×16 grid — one extra PNG round-trip per doc, cached once
    * per (session, dir); q148 reports it, q149's blocking join reuses it. */
  private[graft] def dhash128Frame(s: org.apache.spark.sql.SparkSession, dir: String) =
    CacheRegistry.cache(s, s"q148-dhash128:$dir") {
      val docs = tSpread(s, dir, "documents")
      import s.implicits._
      docs
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val png = pngEncodeGray(GridW, GridH128, pixelGridN(text, GridW, GridH128))
            val (w, h, px) = pngDecodeGray(png)
            require(w == GridW && h == GridH128, s"decode shape $w x $h")
            val (h0, h1, h2, h3) = dHash128(px)
            (id, h0, h1, h2, h3)
          }
        }
        .toDF("doc_id", "h0", "h1", "h2", "h3")
    }

  /** Shared oracle CTEs: the closed-form pixel grid and per-row hash bytes
    * in DuckDB SQL. `rows` has (doc_id, y, rb). */
  private val OracleRowsCte: String =
    """WITH px AS (SELECT doc_id,
      |    regexp_replace(lower(coalesce(text, '')), '[^a-z ]', '', 'g') AS ctext
      |  FROM documents),
      |g AS (SELECT doc_id, t1.y, t2.x,
      |    CASE WHEN len(ctext) > 0
      |         THEN unicode(substr(ctext,
      |                CAST(((t1.y * 9 + t2.x) * len(ctext)) // 72 AS BIGINT) + 1, 1))
      |         ELSE 32 END AS p
      |  FROM px, range(0, 8) t1(y), range(0, 9) t2(x)),
      |bits AS (SELECT l.doc_id, l.y, l.x,
      |    CASE WHEN l.p < r.p THEN 1 ELSE 0 END AS bit
      |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
      |  WHERE l.x < 8),
      |rws AS (SELECT doc_id, y, CAST(sum(bit * (1 << x)) AS BIGINT) AS rb
      |  FROM bits GROUP BY doc_id, y)""".stripMargin

  private val OracleHashCte: String =
    s"""$OracleRowsCte,
       |h AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN y < 4 THEN rb * (1 << (8 * y)) ELSE 0 END) AS BIGINT) AS dhash_hi,
       |    CAST(sum(CASE WHEN y >= 4 THEN rb * (1 << (8 * (y - 4))) ELSE 0 END) AS BIGINT) AS dhash_lo
       |  FROM rws GROUP BY doc_id)""".stripMargin

  /** The 9×16 twin of [[OracleRowsCte]]: 144 cells, 16 row bytes. */
  private val OracleRows128Cte: String =
    """WITH px AS (SELECT doc_id,
      |    regexp_replace(lower(coalesce(text, '')), '[^a-z ]', '', 'g') AS ctext
      |  FROM documents),
      |g AS (SELECT doc_id, t1.y, t2.x,
      |    CASE WHEN len(ctext) > 0
      |         THEN unicode(substr(ctext,
      |                CAST(((t1.y * 9 + t2.x) * len(ctext)) // 144 AS BIGINT) + 1, 1))
      |         ELSE 32 END AS p
      |  FROM px, range(0, 16) t1(y), range(0, 9) t2(x)),
      |bits AS (SELECT l.doc_id, l.y, l.x,
      |    CASE WHEN l.p < r.p THEN 1 ELSE 0 END AS bit
      |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
      |  WHERE l.x < 8),
      |rws AS (SELECT doc_id, y, CAST(sum(bit * (1 << x)) AS BIGINT) AS rb
      |  FROM bits GROUP BY doc_id, y)""".stripMargin

  /** 16 row bytes packed 4-per-long, mirroring [[dHash128]]'s packing —
    * every product ≤ 255·2²⁴, far inside checked BIGINT range. */
  private val OracleHash128Cte: String =
    s"""$OracleRows128Cte,
       |h AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN y < 4 THEN rb * (1 << (8 * y)) ELSE 0 END) AS BIGINT) AS h0,
       |    CAST(sum(CASE WHEN y BETWEEN 4 AND 7 THEN rb * (1 << (8 * (y - 4))) ELSE 0 END) AS BIGINT) AS h1,
       |    CAST(sum(CASE WHEN y BETWEEN 8 AND 11 THEN rb * (1 << (8 * (y - 8))) ELSE 0 END) AS BIGINT) AS h2,
       |    CAST(sum(CASE WHEN y >= 12 THEN rb * (1 << (8 * (y - 12))) ELSE 0 END) AS BIGINT) AS h3
       |  FROM rws GROUP BY doc_id)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- perceptual image hash: decode pixels, hash the raster ----
    // Spark decodes REAL PNG bytes with javax.imageio and hashes the
    // decoded raster; the oracle computes the same dHash from the pixel
    // formula. Lossless round-trip ⇒ strict hash equality end-to-end
    // through encoder, decoder, and hash.
    Q("q142_image_dhash",
      s"""$OracleHashCte
         |SELECT doc_id, dhash_hi, dhash_lo FROM h
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      dhashFrame(s, dir).orderBy(col("doc_id"))
    },

    // ---- Hamming-blocked image near-dup: the q65 recipe on dHash ----
    // Candidates from an equi-join on (band index, 8-bit row byte), then
    // the 25 NEAREST candidate pairs by Hamming distance. The pigeonhole
    // guarantee: any pair at Hamming ≤ 7 over 8 bands shares ≥ 1
    // identical band, so EVERY true near-dup (d ≤ 7) is in the candidate
    // set — asserted against brute force in ImageOpsSpec; beyond d = 7
    // the ranking is best-effort over candidates, which is the
    // production trade (the report is capped anyway). See
    // [[neardupPairs]] for why the band join runs over DISTINCT hashes.
    // TakeOrderedAndProject caps the sort at 25 rows.
    Q("q143_image_neardup",
      s"""$OracleHashCte,
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM rws a JOIN rws b
         |    ON a.y = b.y AND a.rb = b.rb AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |    CAST(bit_count(xor(ha.dhash_hi, hb.dhash_hi))
         |      + bit_count(xor(ha.dhash_lo, hb.dhash_lo)) AS BIGINT) AS hamming
         |  FROM cand
         |  JOIN h ha ON doc_a = ha.doc_id
         |  JOIN h hb ON doc_b = hb.doc_id
         |ORDER BY hamming, doc_a, doc_b
         |LIMIT 25""".stripMargin) { (s, dir) =>
      val maxBandDf =
        s.conf.getOption("graft.imagedup.maxBandDf").map(_.toLong).getOrElse(0L)
      neardupPairs(dhashFrame(s, dir), maxBandDf)
        .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
        .limit(25)
    },

    // ---- 128-bit perceptual hash: the hash-width upgrade ----
    // Same full codec path as q142 (synthesize → real PNG → javax.imageio
    // → hash the DECODED raster) on the tall 9×16 grid. Twice the bits
    // halve false-positive collisions for the SAME band width (a random
    // 8-bit band match carries 1/256 evidence either way, but 16 bands
    // give the pigeonhole d ≤ 15 instead of d ≤ 7) — ScaleBench's
    // image128 phase measures the selectivity trade on the real corpus.
    Q("q148_image_dhash128",
      s"""$OracleHash128Cte
         |SELECT doc_id, h0, h1, h2, h3 FROM h
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      dhash128Frame(s, dir).orderBy(col("doc_id"))
    },

    // ---- Hamming-blocked near-dup on the 128-bit hash ----
    // The q143 recipe with 16 bands: identical-hash collapse first (an
    // exact-dup flood never pays df² in the band join), band join over
    // DISTINCT hashes on (band, byte), optional df cap
    // (graft.imagedup128.maxBandDf), pair-key dedup, THEN member
    // expansion. Pigeonhole now covers every pair at Hamming ≤ 15 over
    // the 128 bits — wider than q143's d ≤ 7 over 64 — while each band
    // stays a bounded 8-bit key (16 × 256 = 4096 band values).
    Q("q149_image_neardup128",
      s"""$OracleHash128Cte,
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM rws a JOIN rws b
         |    ON a.y = b.y AND a.rb = b.rb AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |    CAST(bit_count(xor(ha.h0, hb.h0)) + bit_count(xor(ha.h1, hb.h1))
         |      + bit_count(xor(ha.h2, hb.h2)) + bit_count(xor(ha.h3, hb.h3))
         |      AS BIGINT) AS hamming
         |  FROM cand
         |  JOIN h ha ON doc_a = ha.doc_id
         |  JOIN h hb ON doc_b = hb.doc_id
         |ORDER BY hamming, doc_a, doc_b
         |LIMIT 25""".stripMargin) { (s, dir) =>
      val maxBandDf =
        s.conf.getOption("graft.imagedup128.maxBandDf").map(_.toLong).getOrElse(0L)
      neardupPairs128(dhash128Frame(s, dir), maxBandDf)
        .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
        .limit(25)
    },

    // ---- baseline JPEG decode: the lossy-codec boundary, moved ----
    // Every doc's synthesized 24×16 raster (3×2 MCUs) goes through a REAL
    // lossy JPEG round: encoded by the JDK's libjpeg-backed ImageIO
    // writer (quality 0.9), then decoded TWICE — by [[JpegCodec]] (the
    // pure-JVM baseline decoder) and independently by the JDK reader —
    // and the row records whether the two conforming decoders agree
    // within the ±1/pixel latitude T.81 grants the IDCT. The oracle
    // can't run a DCT, but it doesn't need to: the contract columns
    // (shape + parity bool) are exact literals, so ANY decoder
    // regression — wrong dims, wrong Huffman path, drifted IDCT — flips
    // a value and fails the strict hash. The cross-decoder latitude
    // itself is pinned tighter in JpegCodecSpec (gray ±1 across shapes
    // and qualities, color ≤ 8 through 4:2:0 chroma). Scale shape: one
    // embarrassingly-parallel mapPartitions — the codec-per-partition
    // seam q142 established; no shuffle at all before the final sort.
    Q("q284_jpeg_decode",
      """SELECT doc_id, CAST(24 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(1 AS BOOLEAN) AS jdk_parity_within_1
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          // codec-per-partition seam: reader/writer factories touched
          // once per task, not per row
          it.map { case (id, text) =>
            val px = pixelGridN(text, JpegW, JpegH)
            val bytes = jpegEncodeGrayJdk(JpegW, JpegH, px, 0.9f)
            val ours = JpegCodec.decode(bytes)
            val jdk = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            var maxd = 0
            if (ours.width == JpegW && ours.height == JpegH && ours.ncomp == 1) {
              var y = 0
              while (y < JpegH) {
                var x = 0
                while (x < JpegW) {
                  val d = math.abs(ours.pixels(y * JpegW + x)
                    - jdk.getRaster.getSample(x, y, 0))
                  if (d > maxd) maxd = d
                  x += 1
                }
                y += 1
              }
            } else maxd = 256
            (id, ours.width, ours.height, maxd <= 1)
          }
        }
        .toDF("doc_id", "width", "height", "jdk_parity_within_1")
        .orderBy(col("doc_id"))
    },

    // ---- color JPEG decode audit: the 4:2:0 chroma path at corpus scale ----
    // q284's cross-decoder audit through the SUBSAMPLED color pipeline:
    // the JDK encoder writes RGB as 4:2:0 YCbCr, so [[JpegCodec]]'s
    // multi-component MCU walk (2×2 luma blocks + subsampled chroma),
    // replication upsampling, and YCbCr→RGB conversion all exercise per
    // document. Rasters are per-doc-parameterized SMOOTH gradients —
    // chroma upsampling is implementation-defined (libjpeg interpolates,
    // we replicate), and smooth chroma is where two conforming decoders
    // must agree closely; JpegCodecSpec measured max 4 / mean 0.59 on
    // this shape, pinned here at ≤ 8 per channel. Same strict-literal
    // contract as q284: any decode regression flips the bool.
    Q("q285_jpeg_color_decode",
      """SELECT doc_id, CAST(3 AS INT) AS n_components,
        |  CAST(1 AS BOOLEAN) AS jdk_parity_within_8
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val a = (id % 5 + 1).toInt; val b = (id % 3 + 1).toInt
            val c = (id % 4 + 1).toInt; val d = (id % 6 + 1).toInt
            val px = new Array[Int](3 * JpegW * JpegH)
            var y = 0
            while (y < JpegH) {
              var x = 0
              while (x < JpegW) {
                val base = 3 * (y * JpegW + x)
                px(base) = 16 + a * x + b * y
                px(base + 1) = 200 - c * x - y
                px(base + 2) = 40 + x + d * y
                x += 1
              }
              y += 1
            }
            val bytes = jpegEncodeRgbJdk(JpegW, JpegH, px, 0.9f)
            val ours = JpegCodec.decode(bytes)
            val jdk = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            var maxd = 0
            if (ours.ncomp == 3 && ours.width == JpegW && ours.height == JpegH) {
              var yy = 0
              while (yy < JpegH) {
                var xx = 0
                while (xx < JpegW) {
                  val rgb = jdk.getRGB(xx, yy)
                  val base = 3 * (yy * JpegW + xx)
                  var ch = 0
                  while (ch < 3) {
                    val j = (rgb >> (16 - 8 * ch)) & 0xff
                    val dd = math.abs(ours.pixels(base + ch) - j)
                    if (dd > maxd) maxd = dd
                    ch += 1
                  }
                  xx += 1
                }
                yy += 1
              }
            } else maxd = 256
            (id, ours.ncomp, maxd <= 8)
          }
        }
        .toDF("doc_id", "n_components", "jdk_parity_within_8")
        .orderBy(col("doc_id"))
    },

    // ---- progressive JPEG decode audit: the SOF2 scan machine ----
    // q285's per-document cross-decoder audit with the SAME rasters
    // re-encoded through the JDK writer's PROGRESSIVE scan script
    // (SOF2: interleaved DC-first scan, per-component spectral-band AC
    // scans, successive-approximation DC+AC refinement passes — the
    // most common real-corpus format the engine previously rejected).
    // [[JpegCodec.decodeProgressive]]'s coefficient accumulation, EOBRUN
    // handling, and refinement bit protocol all exercise per document,
    // cross-checked against the JDK's independent progressive decoder;
    // the sequential-vs-progressive agreement is pinned separately in
    // JpegCodecSpec. Scale shape identical to q284/q285: one
    // embarrassingly-parallel mapPartitions, zero shuffle before the sort.
    Q("q297_jpeg_progressive_decode",
      """SELECT doc_id, CAST(3 AS INT) AS n_components,
        |  CAST(1 AS BOOLEAN) AS jdk_parity_within_8
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // graft.jpeg.salvage (default false): the decode-what-accumulated
      // tolerance posture for corrupted progressive scans. A no-op on
      // this query's well-formed payloads — the oracle stays strict at
      // either setting — but the knob rides the same decode entry a
      // crawl pipeline would call (JpegCodecSpec plants the corrupt doc).
      val salvage = s.conf.getOption("graft.jpeg.salvage").exists(_.trim.toBoolean)
      tSpread(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val a = (id % 5 + 1).toInt; val b = (id % 3 + 1).toInt
            val c = (id % 4 + 1).toInt; val d = (id % 6 + 1).toInt
            val px = new Array[Int](3 * JpegW * JpegH)
            var y = 0
            while (y < JpegH) {
              var x = 0
              while (x < JpegW) {
                val base = 3 * (y * JpegW + x)
                px(base) = 16 + a * x + b * y
                px(base + 1) = 200 - c * x - y
                px(base + 2) = 40 + x + d * y
                x += 1
              }
              y += 1
            }
            val bytes = jpegEncodeRgbJdk(JpegW, JpegH, px, 0.9f,
              progressive = true)
            val ours = JpegCodec.decode(bytes, salvageProgressive = salvage)
            val jdk = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            var maxd = 0
            if (ours.ncomp == 3 && ours.width == JpegW && ours.height == JpegH) {
              var yy = 0
              while (yy < JpegH) {
                var xx = 0
                while (xx < JpegW) {
                  val rgb = jdk.getRGB(xx, yy)
                  val base = 3 * (yy * JpegW + xx)
                  var ch = 0
                  while (ch < 3) {
                    val j = (rgb >> (16 - 8 * ch)) & 0xff
                    val dd = math.abs(ours.pixels(base + ch) - j)
                    if (dd > maxd) maxd = dd
                    ch += 1
                  }
                  xx += 1
                }
                yy += 1
              }
            } else maxd = 256
            (id, ours.ncomp, maxd <= 8)
          }
        }
        .toDF("doc_id", "n_components", "jdk_parity_within_8")
        .orderBy(col("doc_id"))
    },

    // ---- arithmetic-coded JPEG decode audit: SOF9 + SOF10 (round 14) ----
    // The codec boundary the reference corpus brief ranked next after
    // progressive Huffman: T.81 Annex D's QM coder under the Annex
    // F.1.4.4 statistical models ([[graft.ops.QmCoder]]/[[JpegArith]]).
    // No third-party arithmetic codec exists in this sandbox (FIXTURES.md
    // §C), so the per-document audit isolates the ENTROPY layer: encode
    // deterministic per-doc quantized coefficients with the
    // [[JpegArithEnc]] mirror encoder — even docs as one sequential SOF9
    // scan, odd docs through a 5-scan progressive SOF10 script with DC/AC
    // refinement passes — decode through the standard
    // [[JpegCodec.decode]] dispatch, and compare pixels byte-exactly
    // against the entropy-free rendering of the same coefficients
    // ([[JpegArithEnc.render]]: the dequant+IDCT+assembly path that
    // JpegCodecSpec pins against the JDK's libjpeg on Huffman streams).
    // Scale shape identical to q284/q285/q297: embarrassingly-parallel
    // mapPartitions, zero shuffle before the final sort.
    Q("q298_jpeg_arith_decode",
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 9 ELSE 10 END AS INT) AS sof,
        |  CAST(1 AS BOOLEAN) AS entropy_parity
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            // deterministic per-doc coefficient blocks: category-boundary
            // magnitudes, sparse/dense mixes, signed DC swings
            val rng = new scala.util.Random(id * 2654435761L + 13)
            val boundary = Array(1, 2, 3, 4, 7, 8, 15, 16, 31, 127, 255, 1023)
            val blocks = Array.tabulate(1, JpegH / 8, JpegW / 8) { (_, _, _) =>
              val z = new Array[Int](64)
              rng.nextInt(4) match {
                case 0 => // sparse boundary magnitudes
                  (0 until 5).foreach { _ =>
                    val k = 1 + rng.nextInt(63)
                    val v = boundary(rng.nextInt(boundary.length))
                    z(k) = if (rng.nextBoolean()) v else -v
                  }
                case 1 => // dense small block
                  (1 until 64).foreach(k => z(k) = rng.nextInt(15) - 7)
                case 2 => // long zero run, one tail coefficient
                  z(63) = boundary(rng.nextInt(boundary.length))
                case _ => // all-zero AC
              }
              z(0) = rng.nextInt(2001) - 1000
              z
            }
            val qt = Array(Array.tabulate(64)(i => 1 + (i * 2) % 31))
            val script =
              if (id % 2 == 0) Seq(JpegArithEnc.Scan(Seq(0), 0, 63, 0, 0))
              else Seq(
                JpegArithEnc.Scan(Seq(0), 0, 0, 0, 1),
                JpegArithEnc.Scan(Seq(0), 1, 63, 0, 2),
                JpegArithEnc.Scan(Seq(0), 0, 0, 1, 0),
                JpegArithEnc.Scan(Seq(0), 1, 63, 2, 1),
                JpegArithEnc.Scan(Seq(0), 1, 63, 1, 0))
            val bytes = JpegArithEnc.encode(JpegW, JpegH, Array(0x11), qt,
              Array(0), blocks, script)
            val got = JpegCodec.decode(bytes)
            val want = JpegArithEnc.render(JpegW, JpegH, Array(0x11), qt,
              Array(0), blocks)
            val parity = got.width == JpegW && got.height == JpegH &&
              java.util.Arrays.equals(got.pixels, want.pixels)
            (id, if (id % 2 == 0) 9 else 10, parity)
          }
        }
        .toDF("doc_id", "sof", "entropy_parity")
        .orderBy(col("doc_id"))
    }
  )

  /** RGB JPEG bytes via the JDK encoder (writes 4:2:0 YCbCr) at a pinned
    * quality — the color half of the cross-decoder audit. `progressive`
    * switches the writer to its default progressive scan script (SOF2) —
    * the q297 fixture path. */
  private[ops] def jpegEncodeRgbJdk(w: Int, h: Int, px: Array[Int],
      quality: Float, progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = 3 * (y * w + x)
        img.setRGB(x, y, ((px(base) & 0xff) << 16) | ((px(base + 1) & 0xff) << 8)
          | (px(base + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  /** JPEG-audit raster: 24×16 = 3×2 MCUs, so the decode walks real
    * multi-MCU scans (DC prediction chains across blocks). */
  private[ops] val JpegW = 24
  private[ops] val JpegH = 16

  /** Gray JPEG bytes via the JDK encoder at a pinned quality — the
    * third-party half of the q284 cross-decoder audit. */
  private[ops] def jpegEncodeGrayJdk(w: Int, h: Int, px: Array[Int],
      quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xff); x += 1 }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  // ------------------------------------------- near-dup candidate engine

  /** One row per (hash, band): 8 bands of 8 bits over the DISTINCT
    * (dhash_hi, dhash_lo) values — positions 0..3 from hi, 4..7 from lo;
    * band value = that row's gradient byte. */
  private[graft] def bandsOf(hashes: DataFrame): DataFrame =
    hashes.select(col("dhash_hi"), col("dhash_lo")).distinct()
      .select(col("dhash_hi"), col("dhash_lo"), explode(expr(
        """transform(sequence(0, 7), y -> named_struct('band', y,
          |  'rb', CASE WHEN y < 4 THEN shiftright(dhash_hi, 8 * y) & 255
          |             ELSE shiftright(dhash_lo, 8 * (y - 4)) & 255 END))"""
          .stripMargin)).as("b"))
      .select(col("dhash_hi"), col("dhash_lo"),
        col("b.band").as("band"), col("b.rb").as("rb"))

  /** All banded near-dup candidate doc pairs with their Hamming distance:
    * (doc_a, doc_b, hamming), doc_a < doc_b — exactly the pairs sharing
    * ≥ 1 band, but generated the way a 100 TB corpus needs:
    *
    *   1. identical hashes collapse FIRST (groupBy-style self-equi-join
    *      on the 64-bit value) and emit their pairs at distance 0 — an
    *      exact-dup-heavy corpus (the common case at scale) never pays
    *      df² inside the band join for hashes that are literally equal,
    *      and these pairs can never be lost to the df cap;
    *   2. the band join runs over DISTINCT hashes, whose band-value df
    *      reflects corpus DIVERSITY rather than raw count, and candidate
    *      hash pairs are deduped on the narrow 128-bit pair key before
    *      members are joined back in;
    *   3. `maxBandDf` > 0 drops band values whose distinct-hash df
    *      exceeds the cap (the q100/q119 skew treatment — the band key
    *      space is FIXED at 2048 values, so a flood of near-identical-
    *      but-not-equal hashes is the one remaining quadratic risk;
    *      capped, candidate volume is ≤ 8·cap·|distinct hashes|, linear).
    *
    * Same candidate SET as banding raw doc rows (a doc pair shares a band
    * iff its hash pair does), asserted in ImageOpsSpec. */
  private[graft] def neardupPairs(h: DataFrame, maxBandDf: Long = 0L,
      probeDocs: Option[DataFrame] = None): DataFrame = {
    // incremental maintenance hook (StreamingImageDedupSpec): the pair set
    // is MONOTONE under arrivals, so the increment for a new batch is
    // exactly the pairs TOUCHING it — probeDocs (doc_id) restricts the
    // probe side of every join to the batch, making the increment's cost
    // ∝ batch, not corpus, while candidates still come from the full store
    val probeH = probeDocs.fold(h)(pd => h.join(pd, Seq("doc_id"), "left_semi"))
    // a full run enumerates each within-pair once via the < ordering; a
    // probe run joins batch × store from the batch side, can see a pair
    // from both ends, and dedupes on the pair key
    val within = probeDocs match {
      case None => h.as("a").join(h.as("b"),
          col("a.dhash_hi") === col("b.dhash_hi") &&
            col("a.dhash_lo") === col("b.dhash_lo") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          lit(0L).as("hamming"))
      case Some(_) => probeH.as("a").join(h.as("b"),
          col("a.dhash_hi") === col("b.dhash_hi") &&
            col("a.dhash_lo") === col("b.dhash_lo") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
          lit(0L).as("hamming"))
        .distinct()
    }
    val bands = cappedBands(h, maxBandDf)
    // full run: < ordering in the join halves the output directly; probe
    // run: the batch's bands probe the full band table from either side
    // of the ordering, so normalize the hash pair afterward
    val hashCand = (probeDocs match {
      case None => bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.rb") === col("b.rb") &&
            struct(col("a.dhash_hi"), col("a.dhash_lo")) <
              struct(col("b.dhash_hi"), col("b.dhash_lo")))
        .select(col("a.dhash_hi").as("h1_hi"), col("a.dhash_lo").as("h1_lo"),
          col("b.dhash_hi").as("h2_hi"), col("b.dhash_lo").as("h2_lo"))
      case Some(_) =>
        // the cap applies to probes too; with no cap the semi join against
        // the surviving band values is a guaranteed no-op (probe hashes
        // are a subset of the store's) — skip the extra aggregate+join
        val probeBands =
          if (maxBandDf <= 0) bandsOf(probeH)
          else bandsOf(probeH)
            .join(bands.select(col("band"), col("rb")).distinct(),
              Seq("band", "rb"), "left_semi")
        probeBands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.rb") === col("b.rb") &&
              struct(col("a.dhash_hi"), col("a.dhash_lo")) =!=
                struct(col("b.dhash_hi"), col("b.dhash_lo")))
          .select(
            when(struct(col("a.dhash_hi"), col("a.dhash_lo")) <
                struct(col("b.dhash_hi"), col("b.dhash_lo")),
              struct(col("a.dhash_hi"), col("a.dhash_lo")))
              .otherwise(struct(col("b.dhash_hi"), col("b.dhash_lo"))).as("h1"),
            when(struct(col("a.dhash_hi"), col("a.dhash_lo")) <
                struct(col("b.dhash_hi"), col("b.dhash_lo")),
              struct(col("b.dhash_hi"), col("b.dhash_lo")))
              .otherwise(struct(col("a.dhash_hi"), col("a.dhash_lo"))).as("h2"))
          .select(col("h1.dhash_hi").as("h1_hi"), col("h1.dhash_lo").as("h1_lo"),
            col("h2.dhash_hi").as("h2_hi"), col("h2.dhash_lo").as("h2_lo"))
    })
      .distinct()
      .withColumn("hamming",
        (expr("bit_count(h1_hi ^ h2_hi)") + expr("bit_count(h1_lo ^ h2_lo)"))
          .cast("long"))
    val cross0 = hashCand
      .join(h.as("ma"), col("ma.dhash_hi") === col("h1_hi") &&
        col("ma.dhash_lo") === col("h1_lo"))
      .join(h.as("mb"), col("mb.dhash_hi") === col("h2_hi") &&
        col("mb.dhash_lo") === col("h2_lo"))
      .select(least(col("ma.doc_id"), col("mb.doc_id")).as("doc_a"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("doc_b"),
        col("hamming"))
    // probe runs: both member expansions ran over the full store (a probe
    // hash can be shared with old docs), so keep only pairs touching the
    // batch
    val cross = probeDocs.fold(cross0) { pd =>
      val flags = pd.select(col("doc_id"), lit(true).as("__new"))
      cross0
        .join(flags.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("__new", "__na"), Seq("doc_a"), "left")
        .join(flags.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("__new", "__nb"), Seq("doc_b"), "left")
        .filter(coalesce(col("__na"), lit(false)) ||
          coalesce(col("__nb"), lit(false)))
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    }
    within.union(cross)
  }

  /** The band table over distinct hashes, with values whose distinct-hash
    * df exceeds `maxBandDf` dropped (0 = no cap). */
  private[graft] def cappedBands(h: DataFrame, maxBandDf: Long): DataFrame = {
    val allBands = bandsOf(h)
    if (maxBandDf <= 0) allBands
    else allBands.join(
      allBands.groupBy(col("band"), col("rb"))
        .agg(count(lit(1)).as("__df")).filter(col("__df") > maxBandDf)
        .select(col("band"), col("rb")),
      Seq("band", "rb"), "left_anti")
  }

  /** The banded candidate HASH pairs alone — the frame whose cardinality
    * is the band join's actual work (ScaleBench measures it directly:
    * member expansion multiplies by true dup multiplicity, which is
    * answer size, not join cost). */
  private[graft] def hashCandidates(h: DataFrame, maxBandDf: Long = 0L): DataFrame = {
    val bands = cappedBands(h, maxBandDf)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.rb") === col("b.rb") &&
          struct(col("a.dhash_hi"), col("a.dhash_lo")) <
            struct(col("b.dhash_hi"), col("b.dhash_lo")))
      .select(col("a.dhash_hi").as("h1_hi"), col("a.dhash_lo").as("h1_lo"),
        col("b.dhash_hi").as("h2_hi"), col("b.dhash_lo").as("h2_lo"))
      .distinct()
  }

  // ------------------------------------- 128-bit near-dup engine (q149)

  private val HCols = Seq("h0", "h1", "h2", "h3")
  private def hkey(alias: String) = struct(HCols.map(c => col(s"$alias.$c")): _*)

  /** One row per (hash, band) over the DISTINCT 128-bit values: 16 bands
    * of 8 bits, band y drawn from long y/4 at byte y%4 — [[dHash128]]'s
    * packing read back. */
  private[graft] def bandsOf128(hashes: DataFrame): DataFrame =
    hashes.select(HCols.map(col): _*).distinct()
      .select(col("h0"), col("h1"), col("h2"), col("h3"), explode(expr(
        """transform(sequence(0, 15), y -> named_struct('band', y,
          |  'rb', CASE WHEN y < 4  THEN shiftright(h0, 8 * y) & 255
          |             WHEN y < 8  THEN shiftright(h1, 8 * (y - 4)) & 255
          |             WHEN y < 12 THEN shiftright(h2, 8 * (y - 8)) & 255
          |             ELSE shiftright(h3, 8 * (y - 12)) & 255 END))"""
          .stripMargin)).as("b"))
      .select(col("h0"), col("h1"), col("h2"), col("h3"),
        col("b.band").as("band"), col("b.rb").as("rb"))

  /** [[cappedBands]] for the 128-bit table: drop band values whose
    * distinct-hash df exceeds `maxBandDf` (0 = no cap). */
  private[graft] def cappedBands128(h: DataFrame, maxBandDf: Long): DataFrame = {
    val allBands = bandsOf128(h)
    if (maxBandDf <= 0) allBands
    else allBands.join(
      allBands.groupBy(col("band"), col("rb"))
        .agg(count(lit(1)).as("__df")).filter(col("__df") > maxBandDf)
        .select(col("band"), col("rb")),
      Seq("band", "rb"), "left_anti")
  }

  /** The banded candidate hash pairs of the 128-bit table — ScaleBench's
    * selectivity probe, mirroring [[hashCandidates]]. */
  private[graft] def hashCandidates128(h: DataFrame, maxBandDf: Long = 0L): DataFrame = {
    val bands = cappedBands128(h, maxBandDf)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.rb") === col("b.rb") &&
          hkey("a") < hkey("b"))
      .select((HCols.map(c => col(s"a.$c").as(s"a_$c")) ++
        HCols.map(c => col(s"b.$c").as(s"b_$c"))): _*)
      .distinct()
  }

  /** [[neardupPairs]] on the 128-bit hash: identical-hash collapse →
    * distinct-hash band join (df-cappable) → pair-key dedup → member
    * expansion. No probe hook — incremental maintenance stays the 64-bit
    * engine's feature; this variant exists to measure the hash-width
    * trade with the same scale discipline. */
  private[graft] def neardupPairs128(h: DataFrame, maxBandDf: Long = 0L): DataFrame = {
    val within = h.as("a").join(h.as("b"),
        HCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    val hashCand = hashCandidates128(h, maxBandDf)
      .withColumn("hamming",
        HCols.map(c => expr(s"bit_count(a_$c ^ b_$c)")).reduce(_ + _).cast("long"))
    val cross = hashCand
      .join(h.as("ma"), HCols.map(c => col(s"ma.$c") === col(s"a_$c")).reduce(_ && _))
      .join(h.as("mb"), HCols.map(c => col(s"mb.$c") === col(s"b_$c")).reduce(_ && _))
      .select(least(col("ma.doc_id"), col("mb.doc_id")).as("doc_a"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("doc_b"),
        col("hamming"))
    within.union(cross)
  }
}
