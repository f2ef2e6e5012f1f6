package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frame-level video path: the MP4-of-PNG-frames container must demux
  * back losslessly (box walk + length-prefix sample walk + javax.imageio),
  * frame-sampling must decode exactly the kept frames, and shot detection
  * must match a sequential textbook pass over the same hash sequence. */
class VideoOpsSpec extends SparkSpec {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog again and again and again",
    "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll mmmm nnnn",
    "",
    "one short doc",
    ("alpha beta gamma delta " * 12) + ("zzz qqq xxx www vvv " * 12))

  test("MP4 demux walks back exactly the encoded PNG frames") {
    texts.zipWithIndex.foreach { case (text, i) =>
      val px = VideoOps.clipGrid(text)
      val got = VideoOps.sampledFrameHashes(VideoOps.videoBytes(text), _ => true)
      assert(got.map(_._1) === (0 until VideoOps.NFrames))
      got.foreach { case (f, hi, lo) =>
        val expected = ImageOps.dHash(
          px.slice(f * VideoOps.FrameCells, (f + 1) * VideoOps.FrameCells))
        assert((hi, lo) === expected, s"frame $f of text #$i")
      }
    }
  }

  test("frame-sampling keeps exactly the accepted indices") {
    val got = VideoOps.sampledFrameHashes(VideoOps.videoBytes(texts.head), _ % 2 == 0)
    assert(got.map(_._1) === Seq(0, 2, 4, 6))
    val odd = VideoOps.sampledFrameHashes(VideoOps.videoBytes(texts.head), _ % 3 == 1)
    assert(odd.map(_._1) === Seq(1, 4, 7))
  }

  test("q243 is the even-frame slice of the all-frame hash table") {
    val all = graft.SparkEntry.queries("q244_video_shots") // force cache setup order safety
    val q243 = graft.SparkEntry.queries("q243_video_framehash")(spark, sf001).collect()
    val full = VideoOps.frameHashesFrom(
        graft.schema.Tables.t(spark, sf001, "documents"))
      .filter(col("frame_idx") % 2 === 0)
      .orderBy(col("doc_id"), col("frame_idx")).collect()
    assert(q243.map(_.toSeq) === full.map(_.toSeq))
    assert(q243.nonEmpty)
  }

  test("q244 equals a sequential textbook shot pass per document") {
    val got = graft.SparkEntry.queries("q244_video_shots")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = graft.schema.Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.size === docs.length)
    docs.foreach { case (id, text) =>
      val hs = VideoOps.sampledFrameHashes(VideoOps.videoBytes(text), _ => true)
      val steps = hs.sliding(2).map { case Seq((_, h1, l1), (_, h2, l2)) =>
        java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
      }.toSeq
      val expected = (1L + steps.count(_ >= VideoOps.ShotHamming),
        steps.max.toLong, steps.map(_.toLong).sum)
      assert(got(id) === expected, s"shot stats mismatch for doc $id")
    }
    // the threshold discriminates on this corpus: both regimes occur
    assert(got.values.exists(_._1 > 1) && got.values.exists(_._1 === 1))
  }
}
