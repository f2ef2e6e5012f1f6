package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** The k smallest DISTINCT values of a string stream — the KMV
  * (k-minimum-values) distinct-count sketch state (Bar-Yossef et al.,
  * RANDOM'02; ClickHouse's `uniqTheta` family is the same idea over a
  * theta threshold), and equally ClickHouse's `groupArraySorted(N)`
  * bounded ordered collect when the estimator is ignored.
  *
  * State is a sorted ≤k vector; reduce rejects anything ≥ the current
  * k-th minimum without allocating, so a partition's pass is O(1) per
  * non-candidate row. Merge concatenates, dedups, and re-caps — valid
  * across ANY partitioning (the k smallest of a union is a function of
  * each side's k smallest). With uniformly-hashed inputs the k-th
  * minimum f estimates |S| ≈ (k−1)/f; when fewer than k distinct values
  * exist the buffer IS the exact set. */
case class MinK(k: Int)(
    implicit bufEnc: Encoder[Seq[String]], outEnc: Encoder[Seq[String]])
  extends Aggregator[String, Seq[String], Seq[String]] {
  require(k > 0, "k must be positive")

  def zero: Seq[String] = Vector.empty

  def reduce(b: Seq[String], x: String): Seq[String] = {
    if (x == null) return b // null carries no value — skip, don't abort
    if (b.length >= k && x >= b.last) b
    else {
      // candidate row (rare once the buffer is warm): insert sorted,
      // distinct, re-cap
      val idx = {
        var lo = 0; var hi = b.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (b(mid) < x) lo = mid + 1 else hi = mid
        }
        lo
      }
      if (idx < b.length && b(idx) == x) b // already present
      else {
        val ins = (b.take(idx) :+ x) ++ b.drop(idx)
        if (ins.length > k) ins.take(k) else ins
      }
    }
  }

  def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    (a ++ b).distinct.sorted.take(k)

  def finish(b: Seq[String]): Seq[String] = b

  def bufferEncoder: Encoder[Seq[String]] = bufEnc
  def outputEncoder: Encoder[Seq[String]] = outEnc
}
