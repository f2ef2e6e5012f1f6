package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** The k-wide MinHash signature of a shingle set as ONE aggregate: input
  * rows are the per-shingle `(h1, h2)` hash pair (see
  * `TextDedup.shingleRowsFor`), the buffer is a single `long[k]`, and each
  * row updates all k slots in a tight loop over the Kirsch–Mitzenmacher
  * seed family `(h1 + i·h2) mod (2^61−1)` — the same seeds, in the same
  * order, as the k separate `min(pmod(h1 + i*h2, p))` aggregate columns it
  * replaces, so the signature (and every band key built from it) is
  * bit-identical and q41/q42/q72/q283's DuckDB oracles are untouched.
  *
  * Why one aggregate instead of k `min` columns (VERDICT r12 item 2): at
  * production width (k=64) the signature stage spent ~48 µs/shingle-row —
  * k separate codegen'd agg-buffer updates each re-evaluating its own
  * pmod expression with null handling, plus a k-wide generated update
  * blob of the kind q43's scaladoc already documents Janino compiling in
  * ~70 s at width 32. Here the inner loop is branch-free long arithmetic
  * on a primitive array: the seed accumulates additively (`s += h2`, no
  * per-slot multiply), and since h1, h2 < 2^56 and i < 128, `h1 + i·h2 <
  * 2^63` never overflows, so `pmod` is plain `%` (the wrap itself is
  * load-bearing for seed independence — see `TextDedup.SeedMod`).
  *
  * Mergeable across any partitioning (elementwise min), so map-side
  * partial aggregation compresses the shuffle to one `long[k]` per
  * (partition, doc) exactly like the k-column formulation.
  */
case class MinHashSig(k: Int)(
    implicit bufEnc: Encoder[Array[Long]])
  extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(k >= 1 && k <= 128, s"signature width $k outside [1, 128]")

  private val P = 2305843009213693951L // Mersenne prime 2^61 − 1

  def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  def reduce(b: Array[Long], x: (Long, Long)): Array[Long] = {
    var s = x._1
    val h2 = x._2
    var i = 0
    while (i < k) {
      val v = s % P
      if (v < b(i)) b(i) = v
      s += h2
      i += 1
    }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] = bufEnc
  def outputEncoder: Encoder[Array[Long]] = bufEnc
}
