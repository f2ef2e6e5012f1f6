package graft.ops

import org.apache.spark.sql.functions._

/** q325 bloom decontamination: the one-sided-error contract (false
  * negatives impossible), agreement with the exact screen (q79), the
  * per-shingle FP accounting, and the no-join/no-shuffle plan shape of
  * the production probe. */
class BloomDecontSpec extends graft.SparkSpec {

  private def shingles = TextDedup.shingleRows(spark, sf001)
  private def bench = shingles.filter(col("doc_id") % 50 === 0)
    .select(col("h1"), col("h2")).distinct()
  private def train = shingles.filter(col("doc_id") % 50 =!= 0)

  test("no false negatives: every true benchmark shingle is flagged") {
    val words = BloomOps.buildWords(bench)
    val benchH = bench.select(col("h1")).distinct().withColumn("bhit", lit(1))
    val misses = BloomOps.screen(train, words)
      .join(benchH, Seq("h1"), "left")
      .filter(col("bhit").isNotNull && !col("flagged"))
      .count()
    assert(misses === 0L)
  }

  test("per-shingle FP accounting sums to q325's n_fp column") {
    val words = BloomOps.buildWords(bench)
    val benchH = bench.select(col("h1")).distinct().withColumn("bhit", lit(1))
    val fpShingles = BloomOps.screen(train, words)
      .join(benchH, Seq("h1"), "left")
      .filter(col("flagged") && col("bhit").isNull)
      .count()
    val q = graft.SparkEntry.queries("q325_bloom_decontaminate")(spark, sf001)
    val totalFp = q.agg(sum(col("n_fp"))).collect()(0).getLong(0)
    assert(totalFp === fpShingles)
  }

  test("n_true agrees with the exact screen q79 on every shared doc") {
    val q79 = graft.SparkEntry.queries("q79_decontaminate")(spark, sf001)
      .withColumnRenamed("n_hits", "exact")
    val q325 = graft.SparkEntry.queries("q325_bloom_decontaminate")(spark, sf001)
    // q325 keeps every doc q79 keeps (no false negatives ⇒ n_true > 0
    // implies n_flagged > 0), with the identical true-overlap count
    val joined = q79.join(q325, Seq("doc_id"), "left")
    assert(joined.filter(col("n_true").isNull).count() === 0L)
    assert(joined.filter(col("n_true") =!= col("exact")).count() === 0L)
  }

  test("a filter sized far beyond the benchmark is exact (zero FPs)") {
    // m = 2^26: k·n/m ≈ 1e-4 ⇒ per-probe FP ≈ (1e-4)^4; on this fixed
    // corpus the screen coincides with exact membership, pinning that
    // the error really is the SIZING, not the structure
    val words = BloomOps.buildWords(bench, mBits = 1 << 26)
    val benchH = bench.select(col("h1")).distinct().withColumn("bhit", lit(1))
    val fp = BloomOps.screen(train, words, mBits = 1 << 26)
      .join(benchH, Seq("h1"), "left")
      .filter(col("flagged") =!= col("bhit").isNotNull)
      .count()
    assert(fp === 0L)
  }

  test("the production probe plans with no join and no exchange") {
    val words = BloomOps.buildWords(bench)
    // probe over a shuffle-free stand-in hash frame: the screen itself
    // must add nothing but a projection (the 100 TB contract — the
    // corpus side is never shuffled or joined to screen it; the shingle
    // frame's own distinct() exchange is upstream of the screen)
    val base = spark.range(1000).select(col("id").as("doc_id"),
      (col("id") * 7919L % 1048576L).as("h1"), (col("id") * 104729L % 1048576L).as("h2"))
    val probe = BloomOps.screen(base, words)
      .filter(col("flagged"))
      .select(col("doc_id"), col("h1"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("broadcast carrier equals the literal carrier row for row") {
    val words = BloomOps.buildWords(bench)
    val a = BloomOps.screen(train, words)
      .select(col("doc_id"), col("h1"), col("flagged"))
    val b = BloomOps.screenBroadcast(train, words)
      .select(col("doc_id"), col("h1"), col("flagged").as("flagged_b"))
    val diff = a.join(b, Seq("doc_id", "h1"))
      .filter(col("flagged") =!= col("flagged_b")).count()
    assert(diff === 0L)
    assert(a.filter(col("flagged")).count() ===
      b.filter(col("flagged_b")).count())
  }

  test("packed words match a direct bit-set construction") {
    val mBits = 1 << 10
    val pos = bench.select(explode(array(BloomOps.posCols(mBits, 4): _*)).as("p"))
      .distinct().collect().map(_.getLong(0)).toSet
    val words = BloomOps.buildWords(bench, mBits = mBits)
    val rebuilt = (0 until mBits).filter(p => ((words(p >>> 6) >>> (p & 63)) & 1L) == 1L)
      .map(_.toLong).toSet
    assert(rebuilt === pos)
  }
}
