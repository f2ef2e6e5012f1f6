package graft.ops

import org.apache.spark.sql.Dataset

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
  *    N-row) round state per round.
  *
  * The conf is read from the OWNING session of the pinned frame — loops
  * that run in an isolated child session (clusterPairs, localForest)
  * copy the caller's value into the child at creation, alongside their
  * shuffle-parallelism override.
  *
  * `eager = false` keeps the lazy-materialization contract both modes
  * share: the first action checkpoints AND returns its result in one job.
  */
object Loops {
  val PinKey = "graft.loop.pin"

  implicit class Pinnable[T](private val ds: Dataset[T]) extends AnyVal {
    /** Truncate lineage per the session's `graft.loop.pin` posture. */
    def pin(eager: Boolean = true): Dataset[T] =
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
  }
}
