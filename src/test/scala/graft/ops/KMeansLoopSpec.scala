package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Loop behavior of [[VectorSearch.kmeansLloydFrom]] that q120's fixed
  * 2-round oracle can't see: convergence detection, termination, stability
  * after convergence, and recovery of planted cluster structure. */
class KMeansLoopSpec extends SparkSpec {

  /** Two well-separated planted clusters in 4-d: even vec_ids hug e1,
    * odd vec_ids hug e2, with small deterministic per-vector jitter.
    * Seeds (vec_id 0, 1) start one in each planted cluster. */
  private def planted(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val eps = 0.01f * (i % 7)
      val e = if (i % 2 == 0) Array(1.0f, eps, eps, 0.1f)
              else Array(eps, 1.0f, 0.1f, eps)
      (i.toLong, e)
    }.toDF("vec_id", "embedding")
  }

  test("converges on planted clusters and recovers them exactly") {
    val (assigned, rounds, converged) =
      VectorSearch.kmeansLloydFrom(planted(40), k = 2, maxRounds = 10)
    assert(converged, "two tight planted clusters must converge within 10 rounds")
    assert(rounds <= 10)
    val byParity = assigned.collect()
      .map(r => (r.getLong(0) % 2, r.getLong(1))).toSeq
    // every even vec lands in one cluster, every odd in the other
    assert(byParity.filter(_._1 == 0L).map(_._2).distinct.length === 1)
    assert(byParity.filter(_._1 == 1L).map(_._2).distinct.length === 1)
    assert(byParity.filter(_._1 == 0L).map(_._2).distinct
      !== byParity.filter(_._1 == 1L).map(_._2).distinct)
  }

  test("assignment is stable after convergence: more rounds change nothing") {
    val df = planted(30)
    val (a1, r1, c1) = VectorSearch.kmeansLloydFrom(df, k = 2, maxRounds = 8)
    val (a2, _, c2) = VectorSearch.kmeansLloydFrom(df, k = 2, maxRounds = 8 + 5)
    assert(c1 && c2)
    val s1 = a1.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val s2 = a2.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(s1 === s2)
    // convergence is detected the round after assignments stop moving, so
    // the longer budget must not run to its cap
    assert(r1 <= 8)
  }

  test("maxRounds caps the loop even without convergence") {
    // k = 1: trivially converged after round 2 (all vectors in the one
    // cluster both rounds); maxRounds = 1 must stop before detection
    val (a, rounds, converged) =
      VectorSearch.kmeansLloydFrom(planted(10), k = 1, maxRounds = 1)
    assert(rounds === 1)
    assert(!converged)
    assert(a.select(countDistinct(col("seed_id"))).head().getLong(0) === 1L)
  }

  test("q120's exact configuration matches the oracle shape on real data") {
    val (assigned, rounds, _) =
      VectorSearch.kmeansLloyd(spark, sf001, k = 5, maxRounds = 2)
    assert(rounds === 2)
    val rows = assigned.collect()
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.length.toLong === n) // every vector assigned exactly once
    assert(rows.map(_.getLong(1)).distinct.forall(sid => sid >= 0 && sid < 5))
  }
}
