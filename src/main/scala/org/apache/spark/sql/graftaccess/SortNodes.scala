package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{SortOrder => SortOrderNode}

/** Accessor for the `private[sql]` sort-order ColumnNode — the ONLY way to
  * read the direction/null-ordering a caller attached to a Column via
  * `.asc`/`.desc` in Spark 4's Column API (the classic `Column.expr` is
  * gone; `Column.node` is public but the node classes are package-private).
  * Lives in a subpackage of `org.apache.spark.sql` solely for that access;
  * contains no logic beyond the unwrap.
  *
  * Used by graft.ops.Skew to build explicit range-boundary predicates that
  * respect the caller's sort direction (SCALE.md "stitch engine"). */
object SortNodes {

  /** (sort key column, isDescending, isNullsFirst). A bare column (no sort
    * node) reads as ascending nulls-first — Spark's `orderBy` default. */
  def parse(c: Column): (Column, Boolean, Boolean) = c.node match {
    case so: SortOrderNode =>
      (new Column(so.child),
        so.sortDirection == SortOrderNode.Descending,
        so.nullOrdering == SortOrderNode.NullsFirst)
    case _ => (c, false, true)
  }
}
