package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MinK's bounded-state contract: exactly the k smallest DISTINCT
  * values under any partitioning, null rows skipped, and the KMV
  * estimator built on it lands inside its theoretical error band. */
class MinKSpec extends SparkSpec {

  test("k smallest distinct under random data and partitioning; merge path exercised") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // duplicates on purpose: distinct semantics are part of the contract
    val vals = (1 to 5000).map(_ => f"v${rnd.nextInt(800)}%04d")
    val expected = vals.distinct.sorted.take(64)
    val got = vals.toDF("x").repartition(7).as[String]
      .select(MinK(64).toColumn).head()
    assert(got == expected)
    // direct reduce/merge exercises the binary-search insert + cap
    val mk = MinK(4)
    val b = Seq("c", "a", "e", "a", "b", "d").foldLeft(mk.zero)(mk.reduce)
    assert(b == Seq("a", "b", "c", "d"))
    assert(mk.reduce(b, null) == b, "null must be a no-op, not an abort")
    assert(mk.merge(Seq("a", "c"), Seq("b", "c", "z")) == Seq("a", "b", "c", "z"))
  }

  test("KMV estimate from the k-th minimum lands in the error band") {
    val s = spark
    import s.implicits._
    val n = 20000
    val hashes = (1 to n).map(i => s"user-$i").toDF("u")
      .select(md5(col("u")).as("hx"))
    val sk = hashes.as[String].select(MinK(256).toColumn).head()
    assert(sk.size == 256)
    val frac = sk(255).take(12).zipWithIndex.map { case (c, i) =>
      ("0123456789abcdef".indexOf(c)).toDouble / math.pow(16, i + 1)
    }.sum
    val est = 255 / frac
    // relative error ~1/sqrt(k) = 6.25%; allow 4σ
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs $n")
  }

  test("graft_min_k from SQL text") {
    val s = spark
    import s.implicits._
    Seq("d", "b", "a", "c", "b").toDF("x").createOrReplaceTempView("mink_in")
    val got = s.sql("SELECT graft_min_k(x, 3) AS m FROM mink_in")
      .head().getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }
}
