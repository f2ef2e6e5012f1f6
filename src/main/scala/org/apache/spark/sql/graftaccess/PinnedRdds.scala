package org.apache.spark.sql.graftaccess

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Accessor for the persisted internal RDD backing a checkpointed Dataset.
  * `Dataset.localCheckpoint`/`checkpoint` return a frame whose plan is a
  * single `LogicalRDD` leaf wrapping the (persisted / reliably-written)
  * InternalRow RDD — the handle needed to `unpersist` a pin once a loop has
  * superseded it (graft.ops.Loops). `Dataset.rdd` can NOT serve: it derives
  * a fresh deserialized RDD per call, and unpersisting that leaves the
  * checkpoint blocks live. Lives in a subpackage of `org.apache.spark.sql`
  * for `private[sql]` access (same rationale as [[SortNodes]]); contains no
  * logic beyond the unwrap. */
object PinnedRdds {

  /** The pinned RDD of a checkpoint-shaped Dataset; None for any other
    * plan (callers treat such frames as untracked). */
  def of(ds: Dataset[_]): Option[RDD[_]] = ds match {
    case d: org.apache.spark.sql.classic.Dataset[_] =>
      d.queryExecution.analyzed match {
        case l: LogicalRDD => Some(l.rdd)
        case _ => None
      }
    case _ => None
  }
}
