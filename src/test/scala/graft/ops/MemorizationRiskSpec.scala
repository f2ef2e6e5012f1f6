package graft.ops

import org.apache.spark.sql.functions._

/** q339 memorization-risk report: sequential recomputation of the
  * dup-count histogram from the raw cluster labels, plus the structural
  * invariants — the buckets PARTITION the corpus (every doc lands in
  * exactly one power-of-two bucket of its cluster size), token_share
  * sums to 1, excess = docs − clusters per bucket, and the log-linear
  * risk tilt is exactly (1 + ⌊log₂k⌋)·tokens. */
class MemorizationRiskSpec extends graft.SparkSpec {

  private def buckets(sf: String) = {
    val s = spark
    import s.implicits._
    val labels = TextDedup.clusterLabels(s, sf)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect()
      .map { case (d, c, k) => d -> (c, k) }.toMap
    val docs = graft.schema.Tables.t(s, sf, "documents")
      .select(col("doc_id"), size(TextCommon.wordsCol).cast("long").as("n"))
      .as[(Long, Long)].collect()
    docs.map { case (id, n) =>
      val (ckey, k) = labels.getOrElse(id, (id, 1L))
      val bucket = 63 - java.lang.Long.numberOfLeadingZeros(k)
      (bucket.toLong, ckey, n)
    }
  }

  test("histogram matches a sequential recomputation from the labels") {
    val rows = buckets(sf001)
    val tot = rows.map(_._3).sum
    val expected = rows.groupBy(_._1).map { case (b, ds) =>
      val toks = ds.map(_._3).sum
      b -> (1L << b, (1L << (b + 1)) - 1,
        ds.map(_._2).distinct.length.toLong, ds.length.toLong, toks,
        BigDecimal(toks.toDouble / tot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        ds.length.toLong - ds.map(_._2).distinct.length,
        (b + 1) * toks)
    }
    val q = graft.SparkEntry.queries("q339_memorization_risk")(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getLong(7), r.getLong(8))).toMap
    assert(q.keySet === expected.keySet)
    expected.foreach { case (b, e) => assert(q(b) === e, s"bucket $b") }
  }

  test("buckets partition the corpus and shares sum to 1") {
    val rows = graft.SparkEntry.queries("q339_memorization_risk")(spark, sf001)
      .collect()
    val nDocs = graft.schema.Tables.t(spark, sf001, "documents").count()
    assert(rows.map(_.getLong(4)).sum === nDocs)
    assert(math.abs(rows.map(_.getDouble(6)).sum - 1.0) < 2e-6)
    rows.foreach { r =>
      // k_min/k_max really bracket a power-of-two bucket
      assert(r.getLong(1) === (1L << r.getLong(0)))
      assert(r.getLong(2) === (1L << (r.getLong(0) + 1)) - 1)
      // excess and risk are derived exactly
      assert(r.getLong(7) === r.getLong(4) - r.getLong(3))
      assert(r.getLong(8) === (r.getLong(0) + 1) * r.getLong(5))
    }
    // bucket 0 is the singleton band: one cluster per doc, zero excess
    val b0 = rows.find(_.getLong(0) === 0L).get
    assert(b0.getLong(3) === b0.getLong(4) && b0.getLong(7) === 0L)
    // the corpus plants near-dups: some bucket above 0 must carry docs
    assert(rows.exists(r => r.getLong(0) > 0 && r.getLong(4) > 0))
  }
}
