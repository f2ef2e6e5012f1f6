package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** VERDICT r14 item 5 — the end-to-end invariant an SFT pipeline ships
  * on: the q314-cleaned corpus, rendered through the q311 chat template,
  * BPE-tokenized with q124's merge machinery, and packed into fixed
  * 512-token context windows by the q312 stitch engine, must DECODE back
  * to the cleaned text exactly — window unpacking → token concatenation
  * → template stripping → the original clean string, for every document.
  *
  * Everything on the encode side is the engine's own distributed
  * machinery (paragraphCleaned, ChatOps.render/conversation,
  * SubstringOps.bpeTrain/mergeOnce, Skew.groupedRunningSum); the decode
  * side is an independent sequential walk over the collected windows, so
  * a lossy defect anywhere in the chain (a dropped token at a window
  * boundary, a non-invertible merge, a span/offset slip) breaks the
  * equality loudly. */
class TokenizerRoundTripSpec extends graft.SparkSpec {

  test("packed 512-token windows detokenize back to the q314-cleaned text") {
    import spark.implicits._
    val cleaned = SelectionOps.paragraphCleaned(spark, sf001)
      .select(col("doc_id"), col("source"), col("clean"))
    val docs = cleaned.as[(Long, String, String)].collect().sortBy(_._1)

    // ---- encode: render (q311) ----
    val rendered = cleaned.as[(Long, String, String)]
      .map { case (id, src, clean) =>
        (id, src, ChatOps.render(ChatOps.conversation(clean))._1)
      }.toDF("doc_id", "source", "rendered")

    // ---- encode: BPE merges trained on the cleaned corpus (q124 shape),
    // applied character-level across the whole rendered string ----
    val wordTable = cleaned
      .select(explode(split(col("clean"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]{4,}$"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(50)
    val (merges, _) = SubstringOps.bpeTrain(wordTable, numMerges = 6)
    assert(merges.nonEmpty, "no merges learned — the corpus is degenerate")
    val toks = merges.foldLeft(
        rendered.withColumn("syms", split(col("rendered"), ""))) {
        case (df, (a, b)) =>
          df.withColumn("syms", SubstringOps.mergeOnce(col("syms"), a, b))
      }
      .withColumn("L", size(col("syms")).cast("long"))

    // ---- encode: pack into 512-token windows per source (q312 engine) ----
    val packed = Skew.groupedRunningSum(toks, Seq("source"),
        Seq(col("doc_id")), col("L"), numPartitions = 4, outCol = "cum")
      .select(col("source"), col("cum"), col("L"),
        posexplode(col("syms")).as(Seq("i", "tok")))
      .select(col("source"), (col("cum") - col("L") + col("i")).as("pos"),
        col("tok"))
      .groupBy(col("source"), expr("pos DIV 512").as("window_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok")))).as("w"))
      .collect()

    // multi-token merges must actually be present in the packed stream,
    // or the round-trip degenerates to a character copy
    assert(packed.exists(_.getSeq[Row](2).exists(_.getString(1).length > 1)),
      "no merged token reached the packed windows")

    // ---- decode: windows → per-source token stream → rendered ----
    val streams: Map[String, String] = packed.groupBy(_.getString(0))
      .map { case (src, rows) =>
        val s = rows.sortBy(_.getLong(1)).iterator.flatMap { r =>
          val cells = r.getSeq[Row](2)
          // slots within a window must be contiguous global positions
          cells.sliding(2).foreach {
            case Seq(a, b) => assert(b.getLong(0) == a.getLong(0) + 1,
              s"$src window ${r.getLong(1)}: token positions not contiguous")
            case _ => ()
          }
          cells.iterator.map(_.getString(1))
        }.mkString
        src -> s
      }
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val expect = ds.sortBy(_._1)
        .map(d => ChatOps.render(ChatOps.conversation(d._3))._1).mkString
      assert(streams(src) == expect, s"source $src: decoded stream diverged")
    }

    // ---- decode: rendered → template strip → the cleaned text ----
    val pre = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n" +
      "<|im_start|>user\n"
    val mid = "<|im_end|>\n<|im_start|>assistant\n"
    val post = "<|im_end|>\n"
    def strip(r: String): String = {
      assert(r.startsWith(pre) && r.endsWith(post), "template frame broken")
      val body = r.substring(pre.length, r.length - post.length)
      val at = body.indexOf(mid)
      assert(at >= 0, "assistant marker missing")
      val usr = body.substring(0, at)
      val asst = body.substring(at + mid.length)
      if (usr.isEmpty) asst else usr + " " + asst
    }
    // walk each source's decoded stream doc by doc (lengths from render —
    // the offsets an SFT loader stores next to its packed shards)
    docs.groupBy(_._2).foreach { case (src, ds) =>
      var off = 0
      val stream = streams(src)
      ds.sortBy(_._1).foreach { case (id, _, clean) =>
        val len = ChatOps.render(ChatOps.conversation(clean))._1.length
        val recovered = strip(stream.substring(off, off + len))
        assert(recovered == clean, s"doc $id: round-trip != cleaned text")
        off += len
      }
      assert(off == stream.length, s"source $src: stream has trailing bytes")
    }
  }
}
