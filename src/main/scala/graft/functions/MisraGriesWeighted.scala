package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Weighted Misra–Gries heavy-hitters sketch — ClickHouse's
  * `topKWeighted(N)(item, weight)` counterpart to [[MisraGries]] (the
  * reference destination's weighted approximate top-N; cf.
  * /root/reference/internal/collector/collector.go's ClickHouse DDL
  * surface). Input is an (item, weight) pair; `reduce` adds the WEIGHT
  * rather than 1.
  *
  * The unweighted error argument is weight-agnostic and carries over
  * verbatim: every prune subtracts the (k+1)-th largest counter value t
  * from all counters, and since ≥ k+1 counters held ≥ t, each prune
  * removes ≥ (k+1)·t of total mass; the mass ever added is the total
  * weight W, so Σt ≤ W/(k+1) — any item's kept count undershoots its
  * true weight by < W/k, across ANY merge tree (Agarwal et al., PODS'12
  * generalizes to weighted updates unchanged). Hence the sketch retains
  * every item whose true total weight exceeds W/k, which licenses the
  * same two-pass exact top-N as q167: recount only the ≤2k candidates.
  *
  * Non-positive weights add no mass, so they are skipped outright: the
  * error bound only needs non-negative mass added, and at corpus scale
  * one poisoned row must not abort the whole pass (the q192 try_*
  * discipline). Callers wanting hard rejection pre-filter upstream. */
case class MisraGriesWeighted(k: Int)(
    implicit bufEnc: Encoder[Map[String, Long]],
    outEnc: Encoder[Seq[String]])
  extends Aggregator[(String, Long), Map[String, Long], Seq[String]] {
  require(k > 0, "k must be positive")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], in: (String, Long)): Map[String, Long] = {
    if (in._2 <= 0L) b
    else {
      val b2 = b.updated(in._1, b.getOrElse(in._1, 0L) + in._2)
      if (b2.size > 2 * k) prune(b2) else b2
    }
  }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (m.size > 2 * k) prune(m) else m
  }

  /** Candidate items, sorted for deterministic downstream shapes; weights
    * are under-estimates (true − kept < W/k) — exact consumers recount. */
  def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  private def prune(m: Map[String, Long]): Map[String, Long] = {
    val counts = m.values.toArray
    java.util.Arrays.sort(counts)
    val thresh = counts(counts.length - (k + 1))
    m.collect { case (w, c) if c > thresh => w -> (c - thresh) }
  }

  def bufferEncoder: Encoder[Map[String, Long]] = bufEnc
  def outputEncoder: Encoder[Seq[String]] = outEnc
}
