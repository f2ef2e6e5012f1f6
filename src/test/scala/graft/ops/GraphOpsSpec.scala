package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** Graph-family invariants beyond the oracle's hash compare: edge-frame
  * structure, PageRank mass accounting, and the no-cartesian plan shape
  * the 100 TB story depends on. */
class GraphOpsSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val edges = GraphOps.knnEdges(spark, sf001).cache()

  // suite-local cache released so the persisted-RDD-hygiene suites
  // (LoopPinSpec, CacheRegistrySpec) hold in any order
  override def afterAll(): Unit = {
    edges.unpersist(blocking = false)
    super.afterAll()
  }

  test("kNN edges: at most 3 neighbors per vector, ranks contiguous from 1") {
    val bad = edges.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("deg"), max(col("rn")).as("maxrn"), min(col("rn")).as("minrn"))
      .filter(col("deg") > 3 || col("maxrn") =!= col("deg") || col("minrn") =!= 1)
    assert(bad.isEmpty, "rank sequence must be 1..deg with deg <= 3")
  }

  test("kNN edges: no self-loops, cosines in [-1, 1]") {
    assert(edges.filter(col("vec_id") === col("nbr_id")).isEmpty)
    assert(edges.filter(col("c") > 1.0 || col("c") < -1.0).isEmpty)
  }

  test("kNN edges: neighbor ranking is by descending cosine") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("rn"))
    val bad = edges.withColumn("next_c", lead(col("c"), 1).over(w))
      .filter(col("next_c").isNotNull && col("next_c") > col("c"))
    assert(bad.isEmpty, "cos must be non-increasing with rank")
  }

  test("q128: pageranks positive, sorted descending, bounded by total mass") {
    val rows = SparkEntry.queries("q128_pagerank")(spark, sf001).collect()
    assert(rows.length == 20)
    val prs = rows.map(_.getDouble(1))
    assert(prs.forall(_ > 0.0))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b }, "not descending")
    // total mass across the WHOLE graph is <= 1 (teleport + damped inflow,
    // dangling mass dropped), so any 20 ranks sum strictly under 1
    assert(prs.sum < 1.0)
  }

  test("q130: seeds keep their true label; propagated labels come from the label set") {
    val rows = SparkEntry.queries("q130_label_prop")(spark, sf001).collect()
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val seeds = rows.filter(_.getLong(0) < 100)
    assert(seeds.nonEmpty && seeds.forall(r => lv(r, 1) == lv(r, 2)),
      "a seed's propagated label must equal its true label")
    val labeled = rows.filter(!_.isNullAt(1)).map(lv(_, 1)).toSet
    val universe = rows.map(lv(_, 2)).toSet
    assert(labeled.subsetOf(universe), "propagation invented a label")
    // 2 hops over a 3-NN graph from a 20% seed set must reach beyond it
    assert(rows.count(r => r.getLong(0) >= 100 && !r.isNullAt(1)) > 0,
      "no label propagated to any non-seed")
  }

  test("q133: expansion excludes the seed set, ranks positive and descending") {
    val emb = graft.schema.Tables.t(spark, sf001, "embeddings")
    val seedIds = emb.filter(col("label") === 0 && col("vec_id") < 100)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("q133_personalized_pagerank")(spark, sf001).collect()
    assert(rows.length == 20)
    assert(rows.forall(r => !seedIds.contains(r.getLong(0))),
      "the expansion must not re-report the query set")
    val prs = rows.map(_.getDouble(1))
    assert(prs.forall(_ > 0.0) && prs.zip(prs.tail).forall { case (a, b) => a >= b })
  }

  test("q134: weighted vote keeps seeds fixed and labels within the universe") {
    val rows = SparkEntry.queries("q134_weighted_label_prop")(spark, sf001).collect()
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val seeds = rows.filter(_.getLong(0) < 100)
    assert(seeds.nonEmpty && seeds.forall(r => lv(r, 1) == lv(r, 2)))
    val labeled = rows.filter(!_.isNullAt(1)).map(lv(_, 1)).toSet
    assert(labeled.subsetOf(rows.map(lv(_, 2)).toSet))
    assert(rows.count(r => r.getLong(0) >= 100 && !r.isNullAt(1)) > 0)
  }

  test("q131: component labels are canonical minima over mutual-edge clusters") {
    val rows = SparkEntry.queries("q131_knn_components")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid label is not its min member")
      assert(members.forall(_._3 == members.length),
        s"cluster $cid size mismatch")
      assert(members.count(_._4) == 1 && members.find(_._4).get._1 == cid,
        s"cluster $cid keeper flag wrong")
      assert(members.length >= 2, "a component from an edge list has >= 2 members")
    }
  }

  test("q147: warm continuation is bit-identical to straight cold rounds") {
    val s = spark
    import s.implicits._
    // a small ring + chords graph with a dangling node (9 has no out-edges)
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 0L,
        0L -> 5L, 5L -> 6L, 6L -> 0L, 2L -> 7L, 7L -> 8L, 8L -> 2L, 3L -> 9L)
      .toDF("src", "dst")
    val nodes = (0L to 9L).toDF("vec_id")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cold5 = ranks(GraphOps.pagerank(nodes, edges, rounds = 5))
    val warm3 = GraphOps.pagerank(nodes, edges, rounds = 3)
    val (cont, used) = GraphOps.pagerankUntil(nodes, edges, maxRounds = 2,
      tol = 0.0, init = Some(warm3))
    assert(used == 2, s"tol=0 on a non-fixpoint state must run both rounds, used $used")
    assert(ranks(cont) == cold5,
      "warm 3+2 must equal cold 5 exactly — the fixed point is start-independent " +
        "and each round's 9dp re-entry is deterministic")
  }

  test("q127/q128 plans: candidate generation is an equi-join, no cartesian") {
    Seq("q127_knn_graph", "q128_pagerank").foreach { n =>
      val p = SparkEntry.queries(n)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$n generates candidates via a cartesian:\n$p")
    }
  }
}
