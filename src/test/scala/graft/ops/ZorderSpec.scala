package graft.ops

import org.apache.spark.sql.functions._

/** q327 z-order layout: bit-exactness of the Morton interleave against a
  * JVM reference, partition completeness, and the locality payoff the
  * layout exists for — per-bucket min/max envelopes tight enough to
  * prune on BOTH dimensions, vs a hash layout (prunes nothing) and a
  * single-column sort (prunes only its own column). */
class ZorderSpec extends graft.SparkSpec {

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    (0 until 16).foreach { b =>
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("the SQL interleave matches the JVM reference bit for bit") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = spark.createDataFrame(pts).toDF("xi", "yi")
      .withColumn("z", expr(LayoutOps.zExpr("xi", "yi")))
    df.collect().foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("buckets partition the table: counts sum to the row count") {
    val q = graft.SparkEntry.queries("q327_zorder_layout")(spark, sf001)
    val total = q.agg(sum(col("n_rows"))).collect()(0).getLong(0)
    val orders = graft.schema.Tables.t(spark, sf001, "orders").count()
    assert(total === orders)
    val buckets = q.select(col("bucket")).collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 64))
  }

  /** Mean normalized envelope area over a bucketing of (ck, od-days):
    * the fraction of the 2-D domain a bucket's min/max box covers —
    * what a min/max file-skipping pruner has to touch. */
  private def meanArea(rows: Array[(Long, Long, Long, Long)],
                       ckRange: Double, odRange: Double): Double = {
    val areas = rows.map { case (ckLo, ckHi, odLo, odHi) =>
      ((ckHi - ckLo + 1) / ckRange) * ((odHi - odLo + 1) / odRange)
    }
    areas.sum / areas.length
  }

  private def envelopes(bucket: org.apache.spark.sql.Column) = {
    val o = graft.schema.Tables.t(spark, sf001, "orders")
      .select(col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("od"))
    o.groupBy(bucket.as("b"))
      .agg(min(col("ck")).as("a"), max(col("ck")).as("b2"),
        min(col("od")).as("c"), max(col("od")).as("d"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  test("z-order envelopes beat hash layout ~everywhere and single-sort on the off dimension") {
    val o = graft.schema.Tables.t(spark, sf001, "orders")
      .select(col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("od"))
    val Array(ckLo, ckHi, odLo, odHi) = o
      .agg(min(col("ck")), max(col("ck")), min(col("od")), max(col("od")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val ckR = (ckHi - ckLo + 1).toDouble
    val odR = (odHi - odLo + 1).toDouble

    // z-layout: the q327 bucketing
    val xi = s"((ck - $ckLo) * 65536) div ${ckHi - ckLo + 1}"
    val yi = s"((od - $odLo) * 65536) div ${odHi - odLo + 1}"
    val zB = expr(s"${LayoutOps.zExpr(s"($xi)", s"($yi)")} >> 26")
    // hash layout (arrival-order stand-in): buckets see the full domain
    val hashB = pmod(hash(col("ck"), col("od")), lit(64)).cast("long")
    // date-sorted layout: equal-width od buckets — perfect od envelopes,
    // but ck envelopes are the whole ck domain
    val odB = expr(s"((od - $odLo) * 64) div ${odHi - odLo + 1}")

    val zArea = meanArea(envelopes(zB), ckR, odR)
    val hashArea = meanArea(envelopes(hashB), ckR, odR)
    val zCk = envelopes(zB).map { case (a, b, _, _) => (b - a + 1) / ckR }
    val sortCk = envelopes(odB).map { case (a, b, _, _) => (b - a + 1) / ckR }

    // hash buckets cover most of the domain (≈23 rows per bucket at
    // sf0.001 leaves some slack off the extremes; at scale this → 1)
    assert(hashArea > 0.7, s"hashArea=$hashArea")
    // z buckets cover a small fraction of it
    assert(zArea < 0.2 * hashArea, s"zArea=$zArea hashArea=$hashArea")
    // and prune on the dimension the date sort gives up on
    val zCkMean = zCk.sum / zCk.length
    val sortCkMean = sortCk.sum / sortCk.length
    assert(zCkMean < 0.5 * sortCkMean, s"z=$zCkMean dateSort=$sortCkMean")
  }
}
