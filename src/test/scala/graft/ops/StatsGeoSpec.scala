package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants of the q172–q178 stats/geo/network battery and the q180
  * blocked edit-distance join that the DuckDB oracle cannot state (the
  * oracle checks VALUES; these check the contracts). */
class StatsGeoSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("q176: dotted-quad roundtrip is the identity on every row") {
    val rows = q("q176_ip_funcs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ip = r.getAs[Long]("ip"); val rt = r.getAs[Long]("ip_rt")
      assert(ip == rt, s"roundtrip broke: $ip -> ${r.getAs[String]("dotted")} -> $rt")
      assert(ip >= 0L && ip < 4294967296L)
      val octs = r.getAs[String]("dotted").split('.').map(_.toLong)
      assert(octs.length == 4 && octs.forall(o => o >= 0 && o <= 255))
    }
  }

  test("q177: coordinates in range, distances within the earth's bound") {
    val rows = q("q177_great_circle").collect()
    assert(rows.nonEmpty)
    // half the great circle of r=6371 km is the maximum separation
    val maxM = math.Pi * 6371000.0
    rows.foreach { r =>
      assert(r.getAs[Double]("lat") >= -90.0 && r.getAs[Double]("lat") < 90.0)
      assert(r.getAs[Double]("lon") >= -180.0 && r.getAs[Double]("lon") < 180.0)
      val d = r.getAs[Double]("metres")
      assert(d >= 0.0 && d <= maxM + 1, s"distance $d outside [0, $maxM]")
    }
  }

  test("q178: per-user diff count is n_events - 1 and deltaSum is non-negative") {
    val rows = q("q178_delta_sum").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_diffs") == r.getAs[Long]("n_events") - 1,
        s"user ${r.getAs[Long]("user_id")}: lag must be null exactly once per user")
      assert(r.getAs[Double]("delta_sum") >= 0.0)
    }
  }

  test("q180: every pair is intra-block, within threshold, from a block <= cap") {
    val s = spark
    import graft.schema.Tables.t
    val pairs = q("q180_edit_blocked").collect()
    assert(pairs.nonEmpty, "testdata should contain blocked near-pairs")
    // recompute the block key + block sizes independently
    val p = t(s, sf001, "documents")
      .select(col("doc_id"), col("lang"), split(lower(trim(col("text"))), "\\s+").as("ws"))
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", slice(col("ws"), 1, 4)).as("pre"),
        col("ws").getItem(0).as("w1"), col("ws").getItem(1).as("w2"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[String]("w1"), r.getAs[String]("w2"),
          r.getAs[String]("pre")))
      .toMap
    val blockSize = p.values.groupBy { case (l, w1, w2, _) => (l, w1, w2) }
      .view.mapValues(_.size).toMap
    pairs.foreach { r =>
      val a = p(r.getAs[Long]("doc_a")); val b = p(r.getAs[Long]("doc_b"))
      assert((a._1, a._2, a._3) == (b._1, b._2, b._3), "pair crosses blocks")
      assert(blockSize((a._1, a._2, a._3)) <= 32, "pair from an oversized block")
      assert(r.getAs[Long]("dist") <= 6L)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("q172/q173: moment and regression aggregates are one hash-agg pass (no window, no sort before agg)") {
    Seq("q172_stats_moments", "q173_linreg").foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name: unexpected window operator\n$plan")
      assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
        s"$name: expected an aggregate\n$plan")
    }
  }
}
