package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected-components label propagation (q72's engine) on synthetic
  * graphs where the expected components are obvious — both engines
  * (pointer doubling and large-star/small-star contraction) must produce
  * identical clusterings. */
class ClusterSpec extends SparkSpec {

  /** Run the same assertions against both CC engines. */
  private def engines = Seq[(String, (org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)](
    "pointer" -> ((s, p) => TextDedup.clusterPairs(s, p)),
    "star" -> ((s, p) => TextDedup.clusterPairsStar(s, p)))

  test("chain, triangle, and pair collapse to min-labeled components") {
    val s = spark
    import s.implicits._
    // components: {1,2,3,4} (a chain — needs propagation over >1 hop),
    // {10,11,12} (triangle), {20,21} (single pair)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")

    for ((name, engine) <- engines) {
      val out = engine(s, pairs)
        .orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      assert(out.toSeq == Seq(
        (1L, 1L, 4L, true), (2L, 1L, 4L, false), (3L, 1L, 4L, false), (4L, 1L, 4L, false),
        (10L, 10L, 3L, true), (11L, 10L, 3L, false), (12L, 10L, 3L, false),
        (20L, 20L, 2L, true), (21L, 20L, 2L, false)), s"engine=$name")
    }
    CacheRegistry.clear(s)
  }

  test("an empty pair set yields an empty clustering, not a crash") {
    val s = spark
    import s.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    for ((name, engine) <- engines) {
      val out = engine(s, none)
      assert(out.columns.toSeq == Seq("doc_id", "cluster_id", "cluster_size", "is_keeper"),
        s"engine=$name")
      assert(out.count() == 0L, s"engine=$name")
    }
    CacheRegistry.clear(s)
  }

  test("a long chain converges within the round bound for both engines") {
    val s = spark
    import s.implicits._
    // path graph 0-1-2-…-199: diameter 199 — plain one-hop propagation
    // would need 199 rounds, far over the 25-round bound; pointer
    // doubling converges in ~log2(199) ≈ 8 rounds and star contraction
    // in O(log n) alternations
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    for ((name, engine) <- engines) {
      val out = engine(s, pairs)
      assert(out.agg(countDistinct(col("cluster_id"))).head.getLong(0) == 1L, s"engine=$name")
      assert(out.filter(col("is_keeper")).head.getLong(0) == 0L, s"engine=$name")
      assert(out.count() == 200L, s"engine=$name")
    }
    CacheRegistry.clear(s)
  }

  test("random multi-partition graph: star (with local-contraction pre-pass) matches pointer") {
    val s = spark
    import s.implicits._
    // deterministic LCG edges over 500 nodes — enough rows that the edge
    // frame spans several partitions, so the star engine's per-partition
    // union-find pre-pass must bridge partition-local roots through
    // shared nodes rather than solve each component in one map
    var seed = 0x5DEECE66DL
    def next(bound: Long): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 16, bound)
    }
    val pairs = (1 to 600).map { _ => (next(500), next(500)) }
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
      .repartition(8)
    val pointer = TextDedup.clusterPairs(s, pairs)
      .orderBy("doc_id").collect().toSeq
    val star = TextDedup.clusterPairsStar(s, pairs)
      .orderBy("doc_id").collect().toSeq
    assert(pointer.nonEmpty)
    assert(star == pointer, "engines disagree on the random graph")
    CacheRegistry.clear(s)
  }

  test("conf gate dispatches q72's clustering to the star engine") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val expected = TextDedup.clusterPairs(s, pairs).orderBy("doc_id").collect().toSeq
    s.conf.set("graft.textdedup.ccAlgo", "star")
    try {
      val viaGate = TextDedup.clusterComponents(s, pairs).orderBy("doc_id").collect().toSeq
      assert(viaGate == expected, "star engine via conf gate must match pointer doubling")
    } finally s.conf.unset("graft.textdedup.ccAlgo")
    CacheRegistry.clear(s)
  }
}
