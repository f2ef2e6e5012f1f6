package graft.ops

import org.apache.spark.sql.functions._

/** q328 leakage-safe splits: the cluster scheme leaks ZERO near-dup
  * clusters across splits by construction, the naive doc-hash scheme
  * measurably leaks on this corpus, and both schemes partition the
  * corpus with consistent doc/unit accounting. */
class LeakageSplitSpec extends graft.SparkSpec {

  private def q = graft.SparkEntry.queries("q328_leakage_safe_split")(spark, sf001)

  test("cluster scheme leaks zero; naive scheme leaks on this corpus") {
    val rows = q.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byScheme = rows.groupBy(_._1)
    assert(byScheme("cluster").forall(_._5 === 0L))
    // the corpus plants near-dup families (q72's clusters are non-empty),
    // so a doc-hash split separating at least one of them is the expected
    // measured outcome — if this ever reads 0 the corpus lost its planted
    // duplicates and the test SHOULD fail loudly
    assert(byScheme("naive").forall(_._5 > 0L), rows.mkString(", "))
  }

  test("both schemes partition the corpus; units never exceed docs") {
    val total = graft.schema.Tables.t(spark, sf001, "documents").count()
    val rows = q.collect().map(r =>
      (r.getString(0), r.getLong(2), r.getLong(3)))
    Seq("cluster", "naive").foreach { s =>
      val mine = rows.filter(_._1 == s)
      assert(mine.map(_._2).sum === total, s)
      assert(mine.forall(r => r._3 <= r._2), s)
    }
  }

  test("naive leak count matches an independent per-member recomputation") {
    def coin(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") /
        lit(4294967296.0)
    def splitOf(c: org.apache.spark.sql.Column) =
      when(coin(c) < 0.8, "train").when(coin(c) < 0.9, "val").otherwise("test")
    // clusters whose MEMBERS' doc-hash splits disagree — computed off the
    // raw component labels, not through the query's rep/leak plumbing
    val independent = TextDedup.clusterLabels(spark, sf001)
      .select(col("cluster_id"), splitOf(col("doc_id")).as("s"))
      .groupBy(col("cluster_id")).agg(countDistinct(col("s")).as("n"))
      .filter(col("n") > 1).count()
    val reported = q.filter(col("scheme") === "naive")
      .select(col("leaked_clusters")).head().getLong(0)
    assert(reported === independent)
  }
}
