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

  test("frames persist at MEMORY_AND_DISK by default (spill, not thrash)") {
    import org.apache.spark.storage.StorageLevel
    val df = CacheRegistry.cache(spark, "sl-default")(spark.range(10).toDF())
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    spark.conf.set("graft.cache.storageLevel", "MEMORY_ONLY")
    try {
      // distinct plan from sl-default's: the CacheManager dedupes identical
      // plans and would keep the first registration's storage level
      val df2 = CacheRegistry.cache(spark, "sl-knob")(spark.range(11).toDF())
      assert(df2.storageLevel == StorageLevel.MEMORY_ONLY)
    } finally spark.conf.unset("graft.cache.storageLevel")
    CacheRegistry.clear(spark)
  }

  test("maxFrames caps the registry with LRU eviction") {
    spark.conf.set("graft.cache.maxFrames", "2")
    try {
      CacheRegistry.cache(spark, "lru-a")(spark.range(1).toDF())
      CacheRegistry.cache(spark, "lru-b")(spark.range(2).toDF())
      CacheRegistry.cache(spark, "lru-a")(spark.range(1).toDF()) // touch a → b is now LRU
      CacheRegistry.cache(spark, "lru-c")(spark.range(3).toDF()) // evicts b
      assert(CacheRegistry.size(spark) == 2)
      // an evicted key rebuilds (new frame, not the stale memo)
      val b1 = CacheRegistry.cache(spark, "lru-b")(spark.range(99).toDF())
      assert(b1.count() == 99)
    } finally spark.conf.unset("graft.cache.maxFrames")
    CacheRegistry.clear(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("release drops exactly one family by key prefix") {
    CacheRegistry.cache(spark, "famA-one")(spark.range(1).toDF())
    CacheRegistry.cache(spark, "famA-two")(spark.range(2).toDF())
    val keep = CacheRegistry.cache(spark, "famB-one")(spark.range(3).toDF())
    CacheRegistry.release(spark, "famA-")
    assert(CacheRegistry.size(spark) == 1)
    assert(keep.storageLevel.useMemory) // untouched family still persisted
    CacheRegistry.clear(spark)
  }
}
