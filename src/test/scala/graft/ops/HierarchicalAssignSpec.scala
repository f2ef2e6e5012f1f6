package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the two-level assignment q123's fixed-size oracle can't
  * see: collapse to the dense argmax when one super covers all seeds, and
  * structural sanity of the approximation. */
class HierarchicalAssignSpec extends SparkSpec {

  private def seedsOf(k: Int) = {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    e.filter(col("vec_id") < k)
      .select(col("vec_id").as("seed_id"), col("embedding").as("se"))
  }

  test("fanout >= k collapses to the dense argmax exactly") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val seeds = seedsOf(10)
    val dense = VectorSearch.assignToSeeds(e, seeds)
      .select("vec_id", "seed_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fanout = k -> g = 1 -> one super holding every seed -> level 2 IS
    // the dense argmax over the full seed table
    val hier = VectorSearch.hierarchicalAssign(e, seeds, fanout = 10)
      .select("vec_id", "seed_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier === dense)
  }

  test("every vector lands on a real seed and members cover the seed table") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val out = VectorSearch.hierarchicalAssign(e, seedsOf(10), fanout = 4)
      .select("vec_id", "seed_id").collect()
    assert(out.length.toLong === e.count())
    assert(out.map(_.getLong(1)).forall(sid => sid >= 0 && sid < 10))
    // agreement with the dense argmax is high on this corpus but not
    // forced to 1.0 — the approximation is the point; just require the
    // two-level rule is not degenerate (more than one cluster used)
    assert(out.map(_.getLong(1)).distinct.length > 1)
  }

  test("q113's conf-gated hier engine produces a valid same-cluster prune") {
    import graft.SparkEntry
    val run = () => SparkEntry.queries("q113_semantic_dedup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    graft.ops.CacheRegistry.clear(spark) // drop any dense-assigned cache
    spark.conf.set("graft.vectorsearch.assignAlgo", "hier")
    try {
      val pruned = run()
      // structure holds under the approximate assignment: every pruned
      // vector names an earlier keeper, never itself
      assert(pruned.forall { case (p, _, dupOf) => dupOf < p })
      assert(pruned.nonEmpty)
    } finally {
      spark.conf.unset("graft.vectorsearch.assignAlgo")
      graft.ops.CacheRegistry.clear(spark) // don't leak hier-assigned cache
    }
    assert(run().forall { case (p, _, dupOf) => dupOf < p }) // dense default intact
  }
}
