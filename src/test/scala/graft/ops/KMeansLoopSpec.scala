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

  test("warm-start from previous centroids: same fixed point, fewer rounds") {
    import spark.implicits._
    // angular geometry engineered so the COLD vec_id<k seeds misassign a
    // boundary vector for a couple of rounds: cluster A hugs 0° (with a
    // 12° straggler), cluster B hugs 60°, and seed 1 sits at 25° — an
    // A-member that round-0 assignment treats as a cluster center
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val batch1 = Seq(0L -> v(-10), 1L -> v(25), 2L -> v(-5), 3L -> v(5),
      4L -> v(12), 5L -> v(55)).toDF("vec_id", "embedding")
    val arrivals = Seq(6L -> v(60), 7L -> v(65)).toDF("vec_id", "embedding")
    val full = batch1.union(arrivals)

    val (a1, _, conv1) = VectorSearch.kmeansLloydFrom(batch1, k = 2, maxRounds = 10)
    assert(conv1)
    // previous converged centroids: rebuild from the final assignment
    val prevCentroids = VectorSearch.centroidRebuild(
      a1.select(col("vec_id"), col("seed_id"))
        .join(batch1, "vec_id")
        .select(col("seed_id"), col("embedding")))

    val (cold, coldRounds, convC) =
      VectorSearch.kmeansLloydFrom(full, k = 2, maxRounds = 10)
    val (warm, warmRounds, convW) = VectorSearch.kmeansLloydFrom(
      full, k = 2, maxRounds = 10, initCentroids = Some(prevCentroids))
    assert(convC && convW)
    def asn(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same partition of the vectors (cluster LABELS may differ between
    // starts — compare co-membership, not seed ids)
    val (cm, wm) = (asn(cold), asn(warm))
    val ids = cm.keySet.toSeq.sorted
    for (a <- ids; b <- ids if a < b)
      assert((cm(a) == cm(b)) === (wm(a) == wm(b)),
        s"cold and warm disagree on co-membership of $a/$b")
    assert(warmRounds < coldRounds,
      s"warm-start must converge faster: warm $warmRounds vs cold $coldRounds")
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
