package graft.ops

import org.apache.spark.sql.functions._
import graft.schema.Tables.t

/** q326 snapshot delta: the four classes partition the page union, the
  * fingerprint comparison recovers exactly the carve's planted
  * revisions, and churn is the non-unchanged share. */
class SnapshotDeltaSpec extends graft.SparkSpec {

  private def q = graft.SparkEntry.queries("q326_snapshot_delta")(spark, sf001)

  test("classes partition the union of both snapshots") {
    val d = t(spark, sf001, "documents")
    val union = d.filter(col("doc_id") % 7 =!= 0 || col("doc_id") % 5 =!= 0)
      .groupBy(col("source")).agg(count(lit(1)).as("n_pages"))
    val sums = q.select(col("source"),
      (col("n_new") + col("n_gone") + col("n_changed") + col("n_unchanged")).as("n"))
    val bad = sums.join(union, Seq("source"))
      .filter(col("n") =!= col("n_pages")).count()
    assert(bad === 0L)
  }

  test("changed = planted revisions present in both snapshots; new/gone match the carve") {
    val d = t(spark, sf001, "documents")
    def cnt(c: org.apache.spark.sql.Column) =
      d.filter(c).groupBy(col("source")).agg(count(lit(1)).as("m"))
    val inA = col("doc_id") % 7 =!= 0
    val inB = col("doc_id") % 5 =!= 0
    val cases = Seq(
      ("n_changed", cnt(inA && inB && col("doc_id") % 3 === 0)),
      ("n_new", cnt(!inA && inB)),
      ("n_gone", cnt(inA && !inB)))
    cases.foreach { case (colName, expect) =>
      val bad = q.join(expect, Seq("source"), "full_outer")
        .filter(coalesce(col(colName), lit(0L)) =!= coalesce(col("m"), lit(0L)))
        .count()
      assert(bad === 0L, colName)
    }
  }

  test("churn is the non-unchanged share, 6dp") {
    val bad = q.filter(
      col("churn") =!= round((col("n_new") + col("n_gone") + col("n_changed")) * lit(1.0)
        / (col("n_new") + col("n_gone") + col("n_changed") + col("n_unchanged")), 6))
      .count()
    assert(bad === 0L)
  }
}
