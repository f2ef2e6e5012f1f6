package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Misra–Gries sketch behind q167 — driven on a synthetic Zipf stream
  * whose vocabulary (5000) far exceeds the sketch capacity, so the prune
  * and merge paths the tiny-vocabulary testdata never triggers actually
  * run here, and the superset guarantee is checked adversarially. */
class MisraGriesSpec extends SparkSpec {

  // deterministic Zipf-ish stream: item i appears ~N/(i+1) times
  private def zipfStream(nItems: Int, scale: Int): Seq[String] =
    (0 until nItems).flatMap(i => Seq.fill(math.max(1, scale / (i + 1)))(f"item$i%05d"))

  test("prune keeps every item with frequency > n/k while bounding state") {
    val s = spark
    import s.implicits._
    val stream = zipfStream(5000, 2000) // ~21k items, 5000 distinct >> 2k
    val k = 64
    val mg = MisraGries(k)
    // fold in two halves through reduce, then merge — exercising both
    // paths; state must never exceed 2k entries
    val (h1, h2) = stream.splitAt(stream.size / 2)
    def fold(part: Seq[String]) = part.foldLeft(mg.zero) { (b, w) =>
      val b2 = mg.reduce(b, w)
      assert(b2.size <= 2 * k, s"buffer grew to ${b2.size} > ${2 * k}")
      b2
    }
    val merged = mg.merge(fold(h1), fold(h2))
    assert(merged.size <= 2 * k)
    assert(merged.size > k / 2, "prune degenerated to near-empty state")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val mustKeep = exact.filter(_._2 > n.toDouble / k).keySet
    assert(mustKeep.nonEmpty, "test stream has no heavy hitters — not a real check")
    val cands = mg.finish(merged).toSet
    assert(mustKeep.subsetOf(cands),
      s"dropped heavy hitters: ${(mustKeep -- cands).take(5)} (guarantee broken)")
  }

  test("two-pass exact top-10 over the sketch equals the exact top-10") {
    val s = spark
    import s.implicits._
    val stream = zipfStream(3000, 1500)
    val df = stream.toDF("item")
    val sketch = MisraGries(64)
    val cands = df.as[String].select(sketch.toColumn).toDF("cands")
      .select(explode(col("cands")).as("item"))
    val got = df.join(broadcast(cands), Seq("item"))
      .groupBy(col("item")).agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = df.groupBy(col("item")).agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q167 returns the exact top-25 bigrams at sf0.001") {
    val s = spark
    val got = graft.SparkEntry.queries("q167_topk_heavy_hitters")(s, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.size == 25)
    // exact reference: plain groupBy top-25 with the same tiebreak
    import graft.schema.Tables.t
    val words = split(lower(trim(col("text"))), "\\s+")
    val exact = t(s, sf001, "documents").select(words.as("words"))
      .select(explode(expr(
        """CASE WHEN size(words) >= 2 THEN
          |  transform(sequence(0, size(words) - 2),
          |    i -> concat(words[i], ' ', words[i+1]))
          |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(25).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }
}
