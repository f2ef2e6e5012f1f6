package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * mergeable-summary answer to ClickHouse's `topK(N)` (the reference
  * destination's approximate top-N list; cf.
  * /root/reference/internal/collector/collector.go's ClickHouse DDL
  * surface). Where q129's count-min estimates a FREQUENCY per queried
  * item, this returns the candidate item SET itself in bounded space.
  *
  * Per-partition state is at most 2k counters; `reduce` increments, and
  * when the map exceeds 2k it applies the batch MG decrement (subtract
  * the (k+1)-th largest count from every counter, drop the non-positive)
  * — amortized O(log k) per element. `merge` sums counters and re-prunes:
  * by the mergeable-summaries result (Agarwal et al., PODS'12) the
  * decrement error stays additive across ANY merge tree, so the final
  * sketch retains EVERY item whose true frequency exceeds n/k regardless
  * of partitioning. That superset guarantee is what makes the two-pass
  * exact top-N legal: pass 2 recounts only the ≤2k candidates exactly
  * (bounded broadcast + map-side-combined count), and if the true N-th
  * count exceeds n/k the recounted top-N is provably the exact top-N.
  *
  * The driver never sees more than the candidate set; at 100 TB the
  * sketch shuffles one ≤2k-entry map per partition — the same partial-
  * merge shape every mergeable aggregation layer needs. */
case class MisraGries(k: Int)(
    implicit bufEnc: Encoder[Map[String, Long]],
    outEnc: Encoder[Seq[String]])
  extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0, "k must be positive")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
    val b2 = b.updated(item, b.getOrElse(item, 0L) + 1L)
    if (b2.size > 2 * k) prune(b2) else b2
  }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (m.size > 2 * k) prune(m) else m
  }

  /** Candidate items, sorted for deterministic downstream shapes. The
    * counts are estimates (true count minus ≤ n/k) — consumers that need
    * exact counts recount the candidates in a second pass. */
  def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  /** Batch MG decrement: subtracting the (k+1)-th largest count from all
    * counters zeroes out at least size−k of them, so the map shrinks to
    * ≤ k entries; every surviving count drops by the same amount, which
    * keeps the (true − kept) error uniform and bounded. */
  private def prune(m: Map[String, Long]): Map[String, Long] = {
    val counts = m.values.toArray
    java.util.Arrays.sort(counts)
    val thresh = counts(counts.length - (k + 1))
    m.collect { case (w, c) if c > thresh => w -> (c - thresh) }
  }

  def bufferEncoder: Encoder[Map[String, Long]] = bufEnc
  def outputEncoder: Encoder[Seq[String]] = outEnc
}
