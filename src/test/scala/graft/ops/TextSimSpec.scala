package graft.ops

import java.nio.file.Files
import graft.SparkSpec
import graft.SparkEntry

/** Semantic checks for the dedup/similarity families on known data: the
  * oracle proves engine parity; these prove the operators mean what they
  * claim. */
class TextSimSpec extends SparkSpec {

  /** A controlled corpus: doc 0 and 1 near-identical (one word changed),
    * doc 2 unrelated — written as a documents.parquet the queries accept. */
  private lazy val tinyDir: String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-tiny").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base.replace("tok7", "changed"), "en", "src0", base.length.toLong),
      (2L, (1 to 40).map(i => s"other$i").mkString(" "), "en", "src1", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash LSH flags the near-duplicate pair and nothing else") {
    val pairs = SparkEntry.queries("q41_minhash_lsh")(spark, tinyDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("exact Jaccard on the near-dup pair is high; unrelated docs absent") {
    val rows = SparkEntry.queries("q42_ngram_jaccard")(spark, tinyDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.keySet == Set((0L, 1L)))
    assert(rows((0L, 1L)) > 0.8) // 3 of 38 shingles touched by one word swap
  }

  test("simhash of near-dups is closer than of unrelated docs") {
    val sim = SparkEntry.queries("q43_simhash")(spark, tinyDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sim(0L), sim(1L)) < hamming(sim(0L), sim(2L)))
  }

  /** Reference answer computed independently in plain Scala. */
  private lazy val trueTop1: Long = {
    val rows = graft.schema.Tables.t(spark, sf001, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = rows.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filter(_._1 != 0L).maxBy(r => cos(q, r._2))._1
  }

  test("brute-force cosine top-1 matches an independent Scala computation") {
    val top = SparkEntry.queries("q44_cosine_topk")(spark, sf001).collect()
    assert(top.head.getLong(0) == trueTop1)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse) // non-increasing
  }

  test("IVF probe returns correctly-ranked vectors from one centroid list") {
    // IVF trades recall for probe cost: the true global neighbor may sit in
    // another list (it does at sf0.001 — that IS the approximation). What
    // the operator guarantees: results come from a single label list, are
    // ranked by true cosine, and agree with brute-force within that list.
    val ivf = SparkEntry.queries("q59_ann_ivf")(spark, sf001).collect()
    assert(ivf.nonEmpty)
    val scores = ivf.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    val labels = graft.schema.Tables.t(spark, sf001, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(ivf.map(r => labels(r.getLong(0))).toSet.size == 1)
  }
}
