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

  private def hilbertRef(x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("the unrolled SQL Hilbert walk matches the JVM reference") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
    var df = spark.createDataFrame(pts).toDF("x", "y")
      .withColumn("x0", col("x")).withColumn("y0", col("y"))
      .withColumn("d", lit(0L))
    LayoutOps.HilbertSides.foreach { s =>
      val (xN, yN, dN) = LayoutOps.hilbertStep(s, "x", "y", "d",
        (a, b) => s"($a ^ $b)")
      df = df.select(col("x0"), col("y0"),
        expr(xN).as("x"), expr(yN).as("y"), expr(dN).as("d"))
    }
    df.collect().foreach { r =>
      assert(r.getLong(4) === hilbertRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("hilbert is a bijection on a 64x64 sub-grid (adjacent ds are adjacent cells)") {
    // exhaustive on the coarse grid: distinct d per cell, d in range, and
    // the defining curve property — consecutive indices are 4-neighbors
    val side = 64
    val cells = for (x <- 0 until side; y <- 0 until side)
      yield (x.toLong * 1024L, y.toLong * 1024L) // stride to lane scale
    val ds = cells.map { case (x, y) => ((x, y), hilbertRef(x, y)) }
    assert(ds.map(_._2).distinct.size === side * side)
    val byD = ds.sortBy(_._2)
    byD.sliding(2).foreach { case Seq((( x1, y1), _), ((x2, y2), _)) =>
      val manhattan = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(manhattan === 1024L, s"jump between ($x1,$y1) and ($x2,$y2)")
    }
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

    // hilbert layout: same lanes through the q329 walk
    var hdf = o
      .withColumn("x", expr(xi)).withColumn("y", expr(yi))
      .withColumn("d", lit(0L))
    LayoutOps.HilbertSides.foreach { s =>
      val (xN, yN, dN) = LayoutOps.hilbertStep(s, "x", "y", "d",
        (a, b) => s"($a ^ $b)")
      hdf = hdf.select(col("ck"), col("od"),
        expr(xN).as("x"), expr(yN).as("y"), expr(dN).as("d"))
    }
    val hEnv = hdf.groupBy(expr("d >> 26").as("b"))
      .agg(min(col("ck")).as("a"), max(col("ck")).as("b2"),
        min(col("od")).as("c"), max(col("od")).as("d2"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val zEnv = envelopes(zB)
    val zArea = meanArea(zEnv, ckR, odR)
    val hashArea = meanArea(envelopes(hashB), ckR, odR)
    val hArea = meanArea(hEnv, ckR, odR)
    info(s"areas: hash=$hashArea z=$zArea hilbert=$hArea")
    // single-bucket envelopes: both curves' equal-width 64-cuts induce
    // the SAME 8x8 cell partition (only the visit ORDER differs), so the
    // per-bucket means must coincide — a structural identity worth
    // pinning because it says the z/hilbert delta is NOT here
    assert(math.abs(hArea - zArea) < 1e-9, s"hilbert=$hArea morton=$zArea")
    // where continuity DOES show: a range scan over consecutive buckets
    // (adjacent output files). Union envelope of each (b, b+1) pair —
    // hilbert's neighbors are always grid-adjacent, morton's jump at
    // seams, so hilbert's mean pair envelope must be strictly tighter
    def pairArea(env: Array[(Long, Long, Long, Long)]): Double = {
      val pairs = env.sliding(2).collect { case Array(a, b) =>
        ((math.max(a._2, b._2) - math.min(a._1, b._1) + 1) / ckR) *
          ((math.max(a._4, b._4) - math.min(a._3, b._3) + 1) / odR)
      }.toSeq
      pairs.sum / pairs.length
    }
    // envelopes() returns rows in collect order — re-sort by bucket id
    val zSorted = o.groupBy(zB.as("b"))
      .agg(min(col("ck")).as("a"), max(col("ck")).as("b2"),
        min(col("od")).as("c"), max(col("od")).as("d2"))
      .orderBy(col("b"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val hSorted = hdf.groupBy(expr("d >> 26").as("b"))
      .agg(min(col("ck")).as("a"), max(col("ck")).as("b2"),
        min(col("od")).as("c"), max(col("od")).as("d2"))
      .orderBy(col("b"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val zPair = pairArea(zSorted)
    val hPair = pairArea(hSorted)
    info(s"consecutive-pair areas: morton=$zPair hilbert=$hPair")
    assert(hPair < zPair, s"hilbert=$hPair morton=$zPair")
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
