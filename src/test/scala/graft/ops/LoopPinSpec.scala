package graft.ops

import graft.{SparkEntry, SparkSpec}

/** The iterative-loop family's conf-gated checkpoint posture
  * (`graft.loop.pin`, [[Loops]]): `local` (default) uses executor-local
  * `localCheckpoint`, `reliable` swaps in fault-tolerant `checkpoint` so
  * an executor loss mid-loop re-reads round state instead of aborting —
  * the cluster posture. Results must be bit-identical either way: the
  * pin changes WHERE round state lives, never what it contains. */
class LoopPinSpec extends SparkSpec {

  private def withReliable[T](body: => T): T = {
    val s = spark
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    s.conf.set(Loops.PinKey, "reliable")
    try body finally s.conf.unset(Loops.PinKey)
  }

  test("pointer-CC loop under reliable checkpointing matches the local pin") {
    val s = spark
    import s.implicits._
    // chain (exercises pointer doubling over rounds) + clique + pair,
    // spread over multiple partitions like a real shuffle would
    val pairs = ((1L to 60L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L)))
      .toDF("doc_a", "doc_b").repartition(4)
    val local = TextDedup.clusterPairs(s, pairs).orderBy("doc_id").collect().toSeq
    val rel = withReliable {
      TextDedup.clusterPairs(s, pairs).orderBy("doc_id").collect().toSeq
    }
    assert(rel.nonEmpty)
    assert(rel == local, "reliable pin changed CC labels")
  }

  test("star-CC and power-iteration loops under reliable checkpointing match local") {
    val s = spark
    import s.implicits._
    val pairs = ((1L to 20L).map(i => (i, i + 1)) ++ Seq((50L, 51L)))
      .toDF("doc_a", "doc_b").repartition(3)
    CacheRegistry.clear(s) // force the loops to actually re-run
    val localStar =
      TextDedup.clusterPairsStar(s, pairs).orderBy("doc_id").collect().toSeq
    val localPow =
      SparkEntry.queries("q125_power_iteration")(s, sf001).collect().toSeq
    withReliable {
      CacheRegistry.clear(s)
      val star =
        TextDedup.clusterPairsStar(s, pairs).orderBy("doc_id").collect().toSeq
      assert(star == localStar, "reliable pin changed star-CC labels")
      val pow = SparkEntry.queries("q125_power_iteration")(s, sf001).collect().toSeq
      assert(pow == localPow, "reliable pin changed the power-iteration loading")
    }
    CacheRegistry.clear(s)
  }

  test("unknown pin mode is rejected loudly") {
    val s = spark
    import s.implicits._
    import Loops._
    s.conf.set(Loops.PinKey, "bogus")
    try {
      val e = intercept[IllegalArgumentException] {
        Seq(1).toDF("x").pin()
      }
      assert(e.getMessage.contains(Loops.PinKey))
    } finally s.conf.unset(Loops.PinKey)
  }
}
