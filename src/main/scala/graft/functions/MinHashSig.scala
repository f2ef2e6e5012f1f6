package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** The k-wide MinHash signature of a shingle set as ONE aggregate: input
  * rows are the per-shingle `(h1, h2)` hash pair (see
  * `TextDedup.shingleRowsFor`), the buffer is a single `long[k]`, and each
  * row updates all k slots in a tight loop over the Kirsch–Mitzenmacher
  * seed family `(h1 + i·h2) mod (2^61−1)` — the same seeds, in the same
  * order, as the k separate `min(pmod(h1 + i*h2, p))` aggregate columns,
  * so the signature (and every band key built from it) is bit-identical
  * (MinHashSigSpec) and q41/q42/q72/q283's DuckDB oracles are untouched.
  * The seed accumulates additively (`s += h2`, no per-slot multiply), and
  * since h1, h2 < 2^56 and i < 128, `h1 + i·h2 < 2^63` never overflows,
  * so `pmod` is plain `%` (the wrap itself is load-bearing for seed
  * independence — see `TextDedup.SeedMod`). Mergeable across any
  * partitioning (elementwise min), so map-side partial aggregation
  * applies.
  *
  * Status: built for VERDICT r12 item 2, measured, and NOT made the
  * default — the A/B at 200k docs / k=64 (SCALE.md round 13) puts this
  * at 2,544 signature-stage cpu-s vs 1,245 for the declarative k-column
  * formulation, because Spark executes an object Aggregator through
  * ObjectHashAggregateExec: one boxed `(Long, Long)` per input row, an
  * object hash map per partition, and — past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128 groups/partition; any sizable corpus) — a sort-based fallback
  * that externally sorted 7.6 GB of shingle rows. The codegen'd k-min
  * HashAggregate updates a fixed-width primitive buffer with zero per-row
  * allocation and needs no conf. Selectable via `graft.minhash.impl=agg`
  * (with the fallback threshold raised) for re-measurement, and the SQL
  * surface (`graft_minhash(h1, h2, k)`) stands on its own for ad-hoc
  * signature queries.
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
      // floorMod, not `%`: graft_minhash is SQL-registered and callable on
      // arbitrary longs, where a negative seed under `%` silently diverges
      // from the declarative min(pmod(...)) path (ADVICE r13). The
      // additive accumulation wraps int64 exactly like the declarative
      // h1 + i*h2 product, so floorMod(s, P) == pmod(h1 + i*h2, P) for
      // ALL inputs, not just the documented h1, h2 < 2^56 domain.
      val v = java.lang.Math.floorMod(s, P)
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
