package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-truth checks for the q239–q242 time-series family: each test
  * writes a synthetic `events.parquet` with a KNOWN structure into a temp
  * dir and runs the registered query against it — the oracle checks value
  * parity on the driver corpus; these check the statistics find what was
  * planted. */
class TimeSeriesSpec extends SparkSpec {

  private def q(name: String, dir: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  /** Write `df` (ts TIMESTAMP, event_type, value) as dir/events.parquet. */
  private def plant(df: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q239: a planted 6-hour cycle wins the period grid") {
    // 120 hours of 10 + round(5*cos(2*pi*t/6)) events per hour — a smooth
    // 6-periodic series whose fundamental dominates its harmonics.
    val dir = plant(spark.range(120).select(col("id").as("t"))
      .select(col("t"), explode(sequence(lit(1),
        (lit(10) + round(lit(5) * cos(lit(2 * math.Pi) * col("t") / 6), 0))
          .cast("int"))).as("i"))
      .select(expr("timestamp_micros(t * 3600000000 + i)").as("ts"),
        lit("click").as("event_type"), lit(1.0).as("value")))
    val rows = q("q239_periodogram", dir).collect()
    assert(rows.length == 23, "23 candidate periods")
    val best = rows.maxBy(_.getAs[Double]("power")).getAs[Long]("p")
    assert(best == 6L, s"planted period 6, periodogram picked $best")
  }

  test("q240: a planted level shift is found at its boundary, exactly") {
    // 20 days: 10/day for days 1-10, 50/day after -> argmax |n*S_k - k*S_n|
    // uniquely at k=10 with stat = |20*100 - 10*600| = 4000.
    val dir = plant(spark.range(20).select(
      expr("timestamp_micros((id * 86400 + 43200) * 1000000 + 1704067200000000)")
        .as("ts"), // 2024-01-01 anchor, noon
      lit("click").as("event_type"),
      when(col("id") < 10, 10.0).otherwise(50.0).as("value")))
    val r = q("q240_cusum_changepoint", dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[java.sql.Date]("cp_day").toString == "2024-01-10")
    assert(r.head.getAs[Double]("stat") == 4000.0)
    assert(r.head.getAs[Long]("n_days") == 20L)
  }

  test("q241: a perfect linear trend has every pairwise slope = its median") {
    val dir = plant(spark.range(10).select(
      expr("timestamp_micros((id * 86400 + 43200) * 1000000 + 1704067200000000)")
        .as("ts"),
      lit("view").as("event_type"),
      (lit(5.0) + lit(2.0) * col("id")).as("value")))
    val r = q("q241_theil_sen", dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_pairs") == 45L)
    assert(r.head.getAs[Double]("slope_median") == 2.0)
  }

  test("q242: an alternating series has acf_k = ±(n-k)/n exactly") {
    // 20 days alternating 10/20 around mean 15: dev = ∓5, every lag-k
    // product = (-1)^k * 25, so acf_k = (-1)^k * (20-k)/20 — exact at 6dp.
    val dir = plant(spark.range(20).select(
      expr("timestamp_micros((id * 86400 + 43200) * 1000000 + 1704067200000000)")
        .as("ts"),
      lit("view").as("event_type"),
      when(col("id") % 2 === 0, 10.0).otherwise(20.0).as("value")))
    val rows = q("q242_acf", dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val k = r.getAs[Long]("lag")
      val want = math.pow(-1.0, k.toDouble) * (20 - k) / 20.0
      assert(r.getAs[Long]("n_terms") == 20 - k)
      assert(math.abs(r.getAs[Double]("acf") - want) < 1e-9,
        s"lag $k: acf ${r.getAs[Double]("acf")} != $want")
    }
  }
}
