package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent-reference checks for the round-10 kernels, beyond their
  * DuckDB oracles: the oracle pins cross-ENGINE agreement, these pin
  * agreement with a second, structurally different implementation — the
  * defense against both sides sharing one misreading of the algorithm. */
class Round10OpsSpec extends SparkSpec {

  test("geohash interleave matches the textbook bisection encoder on random points") {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    // reference: classic interval-bisection geohash (no bit tricks)
    def refEncode(lat: Double, lon: Double): String = {
      var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
      val bits = new StringBuilder
      var even = true
      while (bits.length < 30) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { bits += '1'; lonLo = mid } else { bits += '0'; lonHi = mid }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { bits += '1'; latLo = mid } else { bits += '0'; latHi = mid }
        }
        even = !even
      }
      (0 until 6).map { c =>
        alpha(Integer.parseInt(bits.substring(5 * c, 5 * c + 5), 2))
      }.mkString
    }
    val rows = graft.SparkEntry.queries("q262_geohash")(spark, sf001)
      .select(col("c_custkey"), col("geohash")).collect()
    assert(rows.nonEmpty)
    rows.take(200).foreach { r =>
      val k = r.getLong(0)
      val lat = (k * 7919L % 18000L) / 100.0 - 90.0
      val lon = (k * 104729L % 36000L) / 100.0 - 180.0
      assert(r.getString(1) == refEncode(lat, lon),
        s"custkey $k: ${r.getString(1)} != ${refEncode(lat, lon)}")
    }
  }

  test("unrestricted Damerau matches an independent recursive reference") {
    import graft.functions.StringSim
    // reference: breadth-first search over ACTUAL edit sequences — insert,
    // delete, substitute, and adjacent transposition applied to the
    // evolving string (the unrestricted definition itself, where a
    // transposition may end up spanning deleted characters: 'acb'→'ab'→
    // 'ba' is 2, which the popular "restricted" recursion gets wrong).
    // Inserts/substitutions draw from the target's alphabet and lengths
    // cap at max+2 — an optimal sequence never needs more.
    def ref(a: String, b: String): Int = {
      if (a == b) return 0
      val alpha = b.toSet
      val maxLen = math.max(a.length, b.length) + 2
      var frontier = Set(a)
      val seen = scala.collection.mutable.Set(a)
      var dist = 0
      while (true) {
        dist += 1
        val next = scala.collection.mutable.Set.empty[String]
        for (x <- frontier) {
          val cands = Iterator(
            (0 until x.length).iterator.map(i => x.take(i) + x.drop(i + 1)),
            (for (i <- (0 to x.length).iterator if x.length < maxLen; c <- alpha.iterator)
              yield x.take(i) + c + x.drop(i)),
            (for (i <- (0 until x.length).iterator; c <- alpha.iterator)
              yield x.take(i) + c + x.drop(i + 1)),
            (0 until x.length - 1).iterator.map(i =>
              x.take(i) + x(i + 1) + x(i) + x.drop(i + 2))
          ).flatten
          for (y <- cands if !seen.contains(y)) {
            if (y == b) return dist
            seen += y; next += y
          }
        }
        frontier = next.toSet
        if (frontier.isEmpty) return Int.MaxValue
      }
      dist
    }
    val rnd = new scala.util.Random(42)
    val abc = "abc" // tiny alphabet maximizes transposition collisions
    (1 to 300).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(7))(abc(rnd.nextInt(3))).mkString
      val b = Seq.fill(rnd.nextInt(7))(abc(rnd.nextInt(3))).mkString
      val got = StringSim.damerau(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == ref(a, b), s"damerau('$a','$b') = $got, ref = ${ref(a, b)}")
    }
  }

  test("q276 oriented triangle count equals brute-force enumeration") {
    val row = graft.SparkEntry.queries("q276_triangles")(spark, sf001)
      .collect().head
    val nTri = row.getLong(3)
    // brute force over the same undirected edge set
    val edges = GraphOps.knnEdges(spark, sf001).filter(col("rn") <= 3)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var brute = 0L
    for ((u, v) <- edges; w <- adj.getOrElse(v, Set.empty[Long]))
      if (edges.contains((u, w))) brute += 1
    // brute enumerates each triangle once: u < v < w via (u,v),(v,w),(u,w)
    assert(nTri == brute, s"oriented $nTri != brute $brute")
  }
}
