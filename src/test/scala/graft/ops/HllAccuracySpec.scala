package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, SparkEntry}
import graft.schema.Tables.t

/** Quantitative check for the one rows-only aggregate (q52): HLL++
  * estimates cannot hash-match a DuckDB oracle (engine-specific sketch),
  * but they CAN be held to their documented accuracy — Spark's
  * `approx_count_distinct` default rsd is 0.05 and q52's second column
  * requests 0.01. For a fixed dataset the estimate is deterministic (no
  * query-time RNG), so asserting |approx − exact| ≤ 3·rsd·exact at every
  * SF is a stable, quantitative bound, not a flaky statistical one. */
class HllAccuracySpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001",
    "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("q52 approx_count_distinct lands within 3×rsd of the exact counts") {
    val s = spark
    for (dir <- sfDirs) {
      val approx = SparkEntry.queries("q52_approx_distinct")(s, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val exact = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("parts"),
          countDistinct(col("l_suppkey")).as("supps"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(approx.keySet == exact.keySet, s"$dir: group mismatch")
      for ((flag, (aParts, aSupps)) <- approx) {
        val (eParts, eSupps) = exact(flag)
        def within(a: Long, e: Long, rsd: Double, what: String): Unit =
          assert(math.abs(a - e) <= 3 * rsd * e,
            s"$dir $flag $what: approx $a vs exact $e exceeds 3×rsd=$rsd")
        within(aParts, eParts, 0.05, "parts")
        within(aSupps, eSupps, 0.01, "supps")
      }
    }
  }
}
