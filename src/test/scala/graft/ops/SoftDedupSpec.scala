package graft.ops

import org.apache.spark.sql.functions._

/** q332 soft dedup: sequential recomputation of the weighted accounting
  * from the raw cluster labels, plus the bounds that make the weights a
  * dedup (effective ≤ raw, equality exactly when nothing clusters). */
class SoftDedupSpec extends graft.SparkSpec {

  test("per-source accounting matches a sequential recomputation") {
    val s = spark
    import s.implicits._
    val labels = TextDedup.clusterLabels(s, sf001)
      .select(col("doc_id"), col("cluster_size"))
      .as[(Long, Long)].collect().toMap
    val docs = graft.schema.Tables.t(s, sf001, "documents")
      .select(col("doc_id"), col("source"), size(TextCommon.wordsCol).as("n"))
      .as[(Long, String, Long)].collect()
    def r(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val raw = ds.map(_._3).sum
      val eff = ds.map { case (id, _, n) =>
        r(n.toDouble / labels.getOrElse(id, 1L), 9) }.sum
      src -> (ds.length.toLong, ds.count(d => labels.getOrElse(d._1, 1L) > 1).toLong,
        raw, r(eff.toDouble, 6).toDouble,
        r(1.0 - eff.toDouble / raw, 6).toDouble)
    }
    val q = graft.SparkEntry.queries("q332_soft_dedup_weights")(s, sf001)
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getLong(3),
          row.getDouble(4), row.getDouble(5))).toMap
    assert(q.keySet === expected.keySet)
    expected.foreach { case (src, e) => assert(q(src) === e, src) }
  }

  test("effective <= raw, with equality exactly on cluster-free sources") {
    val rows = graft.SparkEntry.queries("q332_soft_dedup_weights")(spark, sf001)
      .collect()
    rows.foreach { r =>
      val (nClustered, raw, eff) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(eff <= raw + 1e-6, r.getString(0))
      if (nClustered == 0) assert(eff === raw.toDouble, r.getString(0))
      else assert(eff < raw, r.getString(0))
    }
    // the corpus plants near-dups: at least one source must be discounted
    assert(rows.exists(_.getLong(2) > 0))
  }
}
