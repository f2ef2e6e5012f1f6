package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** ClickHouse `uniqUpTo(N)(x)` parity: the EXACT distinct count while it
  * is ≤ N, and N+1 as the saturated "more than N" marker — the bounded-
  * state cardinality gate (is this group's cardinality small?) that a
  * full `count(DISTINCT)` answers with unbounded state.
  *
  * Buffer holds at most N+1 distinct values: once size reaches N+1 the
  * answer is pinned regardless of further input, so reduce stops adding
  * and merge may truncate any union back to N+1 elements (kept as the
  * smallest N+1 for determinism — only the size can ever matter again).
  * Mergeable across any partitioning; per-group state is O(N), not
  * O(cardinality). */
case class UniqUpTo(n: Int)(
    implicit bufEnc: Encoder[Set[Long]], outEnc: Encoder[Long])
  extends Aggregator[Long, Set[Long], Long] {
  require(n > 0, "n must be positive")

  def zero: Set[Long] = Set.empty

  def reduce(b: Set[Long], x: Long): Set[Long] =
    if (b.size > n) b else b + x

  def merge(a: Set[Long], b: Set[Long]): Set[Long] = {
    val m = a ++ b
    if (m.size > n + 1) m.toSeq.sorted.take(n + 1).toSet else m
  }

  def finish(b: Set[Long]): Long = math.min(b.size, n + 1).toLong

  def bufferEncoder: Encoder[Set[Long]] = bufEnc
  def outputEncoder: Encoder[Long] = outEnc
}
