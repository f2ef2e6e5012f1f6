package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frame-level image path: the JDK-only PNG encoder must round-trip
  * losslessly through javax.imageio (the decode step q142 actually runs),
  * the dHash must match its definition bit-for-bit, and the Hamming-
  * blocked near-dup join must find EVERY qualifying pair (pigeonhole
  * exactness vs brute force). */
class ImageOpsSpec extends SparkSpec {

  private def rngGrid(seed: Int, w: Int, h: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h)(rnd.nextInt(256))
  }

  test("PNG encode → javax.imageio decode is a lossless round-trip") {
    for ((w, h, seed) <- Seq((9, 8, 1), (9, 8, 2), (1, 1, 3), (33, 17, 4))) {
      val px = rngGrid(seed, w, h)
      val (dw, dh, dec) = ImageOps.pngDecodeGray(ImageOps.pngEncodeGray(w, h, px))
      assert(dw === w && dh === h)
      assert(dec === px, s"pixel mismatch at ${w}x$h seed $seed")
    }
  }

  test("dHash packs row-wise gradient bits little-endian, hi rows 0-3") {
    // row 0: strictly increasing → all 8 bits set → rb = 255; rows 1-7 flat → 0
    val px = Array.tabulate(9 * 8)(i => if (i < 9) i else 0)
    assert(ImageOps.dHash(px) === ((255L, 0L)))
    // only row 4 (first lo row) has one rising step at x=2
    val px2 = Array.tabulate(9 * 8) { i =>
      val (y, x) = (i / 9, i % 9)
      if (y == 4 && x == 3) 9 else if (y == 4) (if (x > 3) 9 else 1) else 5
    }
    // bits where p(x) < p(x+1) on row 4: only x=2 (1 < 9) → rb = 4
    assert(ImageOps.dHash(px2) === ((0L, 4L)))
  }

  test("q142 equals the closed-form pixel formula (PNG round-trip adds nothing)") {
    val got = graft.SparkEntry.queries("q142_image_dhash")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val texts = graft.schema.Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.size === texts.length)
    texts.foreach { case (id, text) =>
      val expected = ImageOps.dHash(ImageOps.pixelGrid(text))
      assert(got(id) === expected, s"dHash mismatch for doc $id")
    }
    // hashes discriminate: the corpus must not collapse into one bucket
    assert(got.values.toSet.size > texts.length / 4)
  }

  test("neardupPairs == doc-level banding; df cap never loses exact-dup pairs") {
    val s = spark
    import s.implicits._
    // planted: docs 1-3 identical hash; docs 100-129 all share band (0, rb=7)
    // via distinct hashes (a flooded band value); docs 200/201 a d=1 pair in
    // an uncrowded band region
    val flood = (0 until 30).map { i =>
      (100L + i, 7L | (i.toLong + 1) << 8 | (i.toLong + 1) << 16, (i.toLong + 40) << 8)
    }
    val rows = Seq(
      (1L, 0x01020304L, 0x05060708L),
      (2L, 0x01020304L, 0x05060708L),
      (3L, 0x01020304L, 0x05060708L),
      (200L, 0x90a0b0c0L, 0xd0e0f000L),
      (201L, 0x90a0b0c1L, 0xd0e0f000L)) ++ flood
    val h = rows.toDF("doc_id", "dhash_hi", "dhash_lo")

    def bands(hi: Long, lo: Long): Seq[(Int, Long)] =
      (0 until 8).map(y => y -> (if (y < 4) (hi >> (8 * y)) & 255 else (lo >> (8 * (y - 4))) & 255))
    val brute = (for {
      (ida, hia, loa) <- rows; (idb, hib, lob) <- rows
      if ida < idb
      if bands(hia, loa).intersect(bands(hib, lob)).nonEmpty
    } yield (ida, idb,
      (java.lang.Long.bitCount(hia ^ hib) + java.lang.Long.bitCount(loa ^ lob)).toLong)).sorted

    def run(cap: Long) = ImageOps.neardupPairs(h, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    val uncapped = run(0L)
    assert(uncapped == brute, "uncapped engine must equal doc-level banding")
    assert(uncapped.count(_._3 == 0L) == 3, "three exact-dup pairs among docs 1-3")

    val capped = run(10L)
    assert(capped.toSet.subsetOf(uncapped.toSet))
    // the flooded band's cross pairs are cut, the collapse path is not
    assert(capped.count(_._3 == 0L) == 3, "df cap must never lose exact dups")
    assert(capped.contains((200L, 201L, 1L)), "uncrowded near pair survives the cap")
    assert(capped.size < uncapped.size, "the planted flood must actually be cut")

    // probe path (incremental maintenance): pairs touching the probe set,
    // exactly — including a probe doc whose hash is shared with old docs
    val probeIds = Set(1L, 200L, 105L)
    val probed = ImageOps.neardupPairs(h, 0L,
        Some(probeIds.toSeq.toDF("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val expectedProbe =
      brute.filter(p => probeIds.contains(p._1) || probeIds.contains(p._2))
    assert(probed == expectedProbe,
      s"probe increment diverges:\n$probed\nvs\n$expectedProbe")
  }

  test("q143: top-25 nearest blocked pairs; pigeonhole covers every d<=7 pair") {
    val hashes = graft.SparkEntry.queries("q142_image_dhash")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def bands(hi: Long, lo: Long): Seq[(Int, Long)] =
      (0 until 8).map(y => y -> (if (y < 4) (hi >> (8 * y)) & 255 else (lo >> (8 * (y - 4))) & 255))
    def dist(a: (Long, Long, Long), b: (Long, Long, Long)): Long =
      (java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)).toLong
    // reference blocked list, computed independently of the Spark plan
    val expected = (for {
      a <- hashes; b <- hashes
      if a._1 < b._1
      if bands(a._2, a._3).intersect(bands(b._2, b._3)).nonEmpty
    } yield (a._1, b._1, dist(a, b)))
      .sortBy { case (da, db, d) => (d, da, db) }
      .take(25)
    val blocked = graft.SparkEntry.queries("q143_image_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(blocked.toSeq === expected.toSeq)
    assert(blocked.nonEmpty)
    // pigeonhole: EVERY true pair at d <= 7 must be in the candidate set
    // (shares >= 1 band) — the exactness guarantee the blocking rests on
    for {
      a <- hashes; b <- hashes
      if a._1 < b._1 && dist(a, b) <= 7
    } assert(bands(a._2, a._3).intersect(bands(b._2, b._3)).nonEmpty,
      s"d<=7 pair (${a._1},${b._1}) missed by banding")
    graft.ops.CacheRegistry.release(spark, "q142-dhash:")
  }

  test("dHash128 packs 16 row bytes 4-per-long, 32 bits used per long") {
    // row 0 strictly increasing → byte 255 in h0's low byte; rows 1-15 flat
    val px = Array.tabulate(9 * 16)(i => if (i < 9) i else 0)
    assert(ImageOps.dHash128(px) === ((255L, 0L, 0L, 0L)))
    // one rising step at x=2 on row 13 → rb=4 at h3's byte 1 → 4 << 8
    val px2 = Array.tabulate(9 * 16) { i =>
      val (y, x) = (i / 9, i % 9)
      if (y == 13 && x == 3) 9 else if (y == 13) (if (x > 3) 9 else 1) else 5
    }
    assert(ImageOps.dHash128(px2) === ((0L, 0L, 0L, 4L << 8)))
    // every long stays within 32 bits on a random grid (sign-safety)
    val (h0, h1, h2, h3) = ImageOps.dHash128(rngGrid(11, 9, 16))
    Seq(h0, h1, h2, h3).foreach(q => assert(q >= 0 && q <= 0xFFFFFFFFL))
  }

  private def bands16(h: (Long, Long, Long, Long)): Seq[(Int, Long)] = {
    val qs = Seq(h._1, h._2, h._3, h._4)
    (0 until 16).map(y => y -> ((qs(y / 4) >> (8 * (y % 4))) & 255))
  }

  private def dist128(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): Long =
    (java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2) +
      java.lang.Long.bitCount(a._3 ^ b._3) + java.lang.Long.bitCount(a._4 ^ b._4)).toLong

  test("q149: top-25 blocked pairs on 128 bits; pigeonhole covers every d<=15 pair") {
    val hashes = graft.SparkEntry.queries("q148_image_dhash128")(spark, sf001)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val expected = (for {
      (ida, ha) <- hashes; (idb, hb) <- hashes
      if ida < idb
      if bands16(ha).intersect(bands16(hb)).nonEmpty
    } yield (ida, idb, dist128(ha, hb)))
      .sortBy { case (da, db, d) => (d, da, db) }
      .take(25)
    val blocked = graft.SparkEntry.queries("q149_image_neardup128")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(blocked.toSeq === expected.toSeq)
    assert(blocked.nonEmpty)
    for {
      (ida, ha) <- hashes; (idb, hb) <- hashes
      if ida < idb && dist128(ha, hb) <= 15
    } assert(bands16(ha).intersect(bands16(hb)).nonEmpty,
      s"d<=15 pair ($ida,$idb) missed by 16-band blocking")
    graft.ops.CacheRegistry.release(spark, "q148-dhash128:")
  }

  test("neardupPairs128: equals doc-level banding; df cap keeps exact dups") {
    val s = spark
    import s.implicits._
    // docs 1-3 share a 128-bit hash; docs 100-129 flood band (0, rb=7)
    // via distinct hashes; docs 200/201 a d=1 pair in a quiet region
    val flood = (0 until 30).map { i =>
      (100L + i, 7L | (i.toLong + 1) << 8, (i.toLong + 40) << 8, 0L, 0L)
    }
    val rows = Seq(
      (1L, 0x01020304L, 0x05060708L, 0x090a0b0cL, 0x0d0e0f10L),
      (2L, 0x01020304L, 0x05060708L, 0x090a0b0cL, 0x0d0e0f10L),
      (3L, 0x01020304L, 0x05060708L, 0x090a0b0cL, 0x0d0e0f10L),
      (200L, 0x90a0b0c0L, 0xd0e0f000L, 0x11223344L, 0x55667788L),
      (201L, 0x90a0b0c1L, 0xd0e0f000L, 0x11223344L, 0x55667788L)) ++ flood
    val h = rows.toDF("doc_id", "h0", "h1", "h2", "h3")
    val brute = (for {
      (ida, a0, a1, a2, a3) <- rows; (idb, b0, b1, b2, b3) <- rows
      if ida < idb
      if bands16((a0, a1, a2, a3)).intersect(bands16((b0, b1, b2, b3))).nonEmpty
    } yield (ida, idb, dist128((a0, a1, a2, a3), (b0, b1, b2, b3)))).sorted
    def run(cap: Long) = ImageOps.neardupPairs128(h, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val uncapped = run(0L)
    assert(uncapped == brute, "uncapped 128-bit engine must equal doc-level banding")
    assert(uncapped.count(_._3 == 0L) == 3)
    val capped = run(10L)
    assert(capped.toSet.subsetOf(uncapped.toSet))
    assert(capped.count(_._3 == 0L) == 3, "df cap must never lose exact dups")
    assert(capped.contains((200L, 201L, 1L)), "uncrowded near pair survives the cap")
    assert(capped.size < uncapped.size, "the planted flood must actually be cut")
  }
}
