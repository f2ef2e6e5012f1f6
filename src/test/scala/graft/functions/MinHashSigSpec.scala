package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The round-13 signature-path rewrite must be BIT-EXACT with the
  * formulation it replaces, or every dedup oracle (q41/q42/q72/q283)
  * silently drifts:
  *
  *  - `graft_md5_split` (digest bytes → [h1, h2]) vs the original
  *    md5-hex + conv(substring) parse — property-checked on adversarial
  *    strings (empty, unicode, long, leading-zero digests eventually hit
  *    by volume);
  *  - `graft_minhash` (one long[k] buffer) vs k separate
  *    min(pmod(h1 + i*h2, p)) aggregate columns — checked through the
  *    REAL `TextDedup.bandRows` A/B conf (`graft.minhash.impl=cols`) at
  *    the oracle width and the production width.
  */
class MinHashSigSpec extends SparkSpec {

  test("graft_md5_split equals the md5-hex conv(substring) parse") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13)
    val cases = Seq("", "a", "the quick brown fox", "naïve café — ünïcode",
      "é́ combining", "日本語のテキスト", "x" * 4096) ++
      (1 to 500).map(_ => rng.alphanumeric.take(1 + rng.nextInt(40)).mkString) ++
      (1 to 100).map(_ => (1 to 3).map(_ => rng.nextPrintableChar()).mkString(" "))
    val df = cases.toDF("sh").select(
      col("sh"),
      call_function("graft_md5_split", col("sh")).as("hh"),
      conv(substring(md5(col("sh")), 1, 14), 16, 10).cast("long").as("e1"),
      conv(substring(md5(col("sh")), 15, 14), 16, 10).cast("long").as("e2"))
    val bad = df.filter(col("hh").getItem(0) =!= col("e1") ||
      col("hh").getItem(1) =!= col("e2"))
    assert(bad.count() === 0, bad.collect().take(3).mkString("; "))
    // range invariant the seed family depends on: both halves < 2^56
    val mx = df.agg(max(greatest(col("hh").getItem(0), col("hh").getItem(1))))
      .head().getLong(0)
    assert(mx < (1L << 56))
    // null flows through as null, not a crash
    assert(Seq[String](null).toDF("sh")
      .select(call_function("graft_md5_split", col("sh"))).head().isNullAt(0))
  }

  test("graft_minhash bandRows == k-column min(pmod) bandRows at k=8/64") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(41)
    // synthetic shingle frame in the real value domain: h1, h2 < 2^56
    val rows = (1 to 80).flatMap { d =>
      (0 until 5 + rng.nextInt(60)).map { _ =>
        (d.toLong, rng.nextLong() & ((1L << 56) - 1), rng.nextLong() & ((1L << 56) - 1))
      }
    }
    val sh = rows.toDF("doc_id", "h1", "h2")
    for (k <- Seq(8, 64)) {
      s.conf.set("graft.minhash.hashes", k.toString)
      try {
        val cols = graft.ops.TextDedup.bandRows(sh) // default: declarative k-min
          .orderBy("doc_id", "band").collect().toSeq
        s.conf.set("graft.minhash.impl", "agg")
        val agg =
          try graft.ops.TextDedup.bandRows(sh).orderBy("doc_id", "band").collect().toSeq
          finally s.conf.unset("graft.minhash.impl")
        assert(agg === cols, s"agg vs cols band rows diverge at k=$k")
        assert(cols.size === 80 * (k / 2)) // 2-row bands → k/2 per doc
      } finally s.conf.unset("graft.minhash.hashes")
    }
  }

  test("graft_minhash from SQL text matches the reduce/merge reference") {
    val s = spark
    import s.implicits._
    val p = 2305843009213693951L
    val data = Seq((7L, 11L), (123456789L, 987654321L),
      ((1L << 56) - 1, (1L << 56) - 1), (0L, 5L))
    data.toDF("h1", "h2").createOrReplaceTempView("mh_in")
    val got = s.sql("SELECT graft_minhash(h1, h2, 4) AS sig FROM mh_in")
      .head().getSeq[Long](0)
    val want = (0 until 4).map(i => data.map { case (h1, h2) => (h1 + i * h2) % p }.min)
    assert(got === want)
  }

  test("graft_minhash matches min(pmod) on NEGATIVE / arbitrary longs") {
    // the SQL surface is callable on any long, not just the md5-split
    // domain h < 2^56; floorMod (not `%`) keeps it equal to the pmod
    // formulation there too (ADVICE r13)
    val s = spark
    import s.implicits._
    // domain: any longs for which h1 + i*h2 doesn't overflow int64 (ANSI
    // mode makes the declarative reference itself throw past that, so
    // equality is only definable inside it); |h| < 2^57 keeps i ≤ 5 safe
    // while exercising plenty of NEGATIVE seeds, where `%` diverges
    val rng = new scala.util.Random(59)
    def draw(): Long = rng.nextLong() % (1L << 57)
    val data = Seq((-7L, 11L), (5L, -3L), (-(1L << 56), (1L << 56) - 1),
      (-1L, -1L)) ++ (1 to 200).map(_ => (draw(), draw()))
    data.toDF("h1", "h2").createOrReplaceTempView("mh_neg_in")
    val got = s.sql("SELECT graft_minhash(h1, h2, 6) AS sig FROM mh_neg_in")
      .head().getSeq[Long](0)
    val want = s.sql(
      ("SELECT " + (0 until 6).map(i =>
        s"min(pmod(h1 + $i * h2, 2305843009213693951)) AS m$i").mkString(", ")) +
        " FROM mh_neg_in").head()
    assert(got === (0 until 6).map(want.getLong))
  }

  test("graft_md5_split rejects wrong arity with a named error") {
    val e0 = intercept[Exception](spark.sql("SELECT graft_md5_split()").collect())
    assert(e0.getMessage.contains("graft_md5_split expects 1 argument"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_md5_split('a', 'b')").collect())
    assert(e2.getMessage.contains("graft_md5_split expects 1 argument"))
  }
}
