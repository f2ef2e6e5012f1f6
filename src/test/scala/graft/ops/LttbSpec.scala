package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q204 LTTB downsampling — the contract the DuckDB oracle cannot state:
  * the distributed 8-round unrolling must equal the TEXTBOOK sequential
  * algorithm (Steinarsson 2013) run per user in plain Scala. */
class LttbSpec extends SparkSpec {

  test("q204: 10 points per user, endpoints kept, equals the sequential LTTB") {
    val out = graft.SparkEntry.queries("q204_lttb_downsample")(spark, sf001)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("idx"),
        r.getAs[Long]("us"), r.getAs[Double]("v")))
      .groupBy(_._1)
    assert(out.nonEmpty)
    val series = graft.schema.Tables.t(spark, sf001, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("value"), col("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Double]("value"), r.getAs[Long]("event_id")))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(e => (e._2, e._4)).toIndexedSeq).toMap

    def sequentialLttb(pts: IndexedSeq[(Long, Double)]): Seq[Int] = {
      val n = pts.length
      if (n <= 10) return pts.indices
      val m = n - 2
      val buckets = (0 until m).groupBy(i => i * 8 / m) // interior 0-based
      // exact centroids like the query: integer us sum, 2-decimal value sum
      def centroid(b: Int): (Double, Double) = {
        val is = buckets(b)
        val sx = is.map(i => pts(i + 1)._1).sum
        val sy = is.map(i => BigDecimal(pts(i + 1)._2).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (sx.toDouble / is.size, (sy / is.size).toDouble)
      }
      var sel = List(0)
      var prev = (pts(0)._1.toDouble, pts(0)._2)
      for (k <- 0 until 8) {
        val (ax, ay) =
          if (k == 7) (pts(n - 1)._1.toDouble, pts(n - 1)._2) else centroid(k + 1)
        val cand = buckets(k).map { i =>
          val (x, y) = (pts(i + 1)._1.toDouble, pts(i + 1)._2)
          val a = math.abs((prev._1 - ax) * (y - prev._2)
            - (prev._1 - x) * (ay - prev._2))
          (a, -(i + 1), x, y) // tiebreak: earliest index
        }
        val w = cand.max
        sel = -w._2 :: sel
        prev = (w._3, w._4)
      }
      ((n - 1) :: sel).reverse
    }

    out.foreach { case (u, rows) =>
      val pts = series(u).map(e => (e._2, e._3))
      val expect = sequentialLttb(pts).map(_ + 1) // 1-based idx
      val got = rows.map(_._2.toInt).sorted.toSeq
      assert(got == expect.sorted,
        s"user $u: distributed ${got.mkString(",")} != sequential ${expect.sorted.mkString(",")}")
      if (pts.length > 10) {
        assert(got.size == 10)
        assert(got.head == 1 && got.last == pts.length, s"user $u endpoints missing")
      }
    }
  }
}
