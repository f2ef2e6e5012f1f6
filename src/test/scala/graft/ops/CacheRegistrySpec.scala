package graft.ops

import graft.SparkSpec

/** Persist lifecycle: every operator cache is registered and released —
  * no persisted RDDs may outlive CacheRegistry.clear (the Verify/Bench
  * end-of-run hook), so long-lived sessions don't leak executor memory. */
class CacheRegistrySpec extends SparkSpec {

  test("operator caches are registered, reused, and fully released") {
    val dir = "/root/testdata/sf0.001"
    // run the cache-using operator families end-to-end
    graft.SparkEntry.queries("q41_minhash_lsh")(spark, dir).count()
    graft.SparkEntry.queries("q65_embed_neardup")(spark, dir).count()
    assert(CacheRegistry.size(spark) >= 2) // shingles + bands + coded
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)

    CacheRegistry.clear(spark)
    assert(CacheRegistry.size(spark) == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "no persisted RDD may survive clearCaches")
  }

  test("cache memoizes per key") {
    val a = CacheRegistry.cache(spark, "k1")(spark.range(10).toDF())
    val b = CacheRegistry.cache(spark, "k1")(spark.range(99).toDF())
    assert(a eq b) // second build not evaluated
    CacheRegistry.clear(spark)
  }
}
