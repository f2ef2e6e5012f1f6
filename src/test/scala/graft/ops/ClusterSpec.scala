package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected-components label propagation (q72's engine) on synthetic
  * graphs where the expected components are obvious. */
class ClusterSpec extends SparkSpec {

  test("chain, triangle, and pair collapse to min-labeled components") {
    val s = spark
    import s.implicits._
    // components: {1,2,3,4} (a chain — needs propagation over >1 hop),
    // {10,11,12} (triangle), {20,21} (single pair)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")

    val out = TextDedup.clusterPairs(s, pairs)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    assert(out.toSeq == Seq(
      (1L, 1L, 4L, true), (2L, 1L, 4L, false), (3L, 1L, 4L, false), (4L, 1L, 4L, false),
      (10L, 10L, 3L, true), (11L, 10L, 3L, false), (12L, 10L, 3L, false),
      (20L, 20L, 2L, true), (21L, 20L, 2L, false)))
    CacheRegistry.clear(s)
  }

  test("an empty pair set yields an empty clustering, not a crash") {
    val s = spark
    import s.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = TextDedup.clusterPairs(s, none)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id", "cluster_size", "is_keeper"))
    assert(out.count() == 0L)
    CacheRegistry.clear(s)
  }

  test("a long chain converges in O(log diameter) rounds (pointer doubling)") {
    val s = spark
    import s.implicits._
    // path graph 0-1-2-…-199: diameter 199 — plain one-hop propagation
    // would need 199 rounds, far over the 25-round bound; pointer
    // doubling must converge it in ~log2(199) ≈ 8 rounds
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = TextDedup.clusterPairs(s, pairs)
    assert(out.agg(countDistinct(col("cluster_id"))).head.getLong(0) == 1L)
    assert(out.filter(col("is_keeper")).head.getLong(0) == 0L)
    assert(out.count() == 200L)
    CacheRegistry.clear(s)
  }
}
