package graft.ops

import org.apache.spark.sql.functions._

/** q331 frontier schedule: the politeness contract (same-host fetches
  * exactly |hosts| slots apart), slot injectivity, and priority order
  * within a host. */
class FrontierSpec extends graft.SparkSpec {

  private def q = graft.SparkEntry.queries("q331_frontier_schedule")(spark, sf001)

  test("politeness: every multi-page host's slot gaps are exactly |hosts|") {
    val rows = q.collect()
    val nHosts = rows.length.toLong
    rows.filter(_.getLong(1) > 1).foreach { r =>
      assert(r.getLong(4) === nHosts, s"host ${r.getString(0)} min_gap")
      assert(r.getLong(5) === nHosts, s"host ${r.getString(0)} max_gap")
    }
    // span closes the invariant: last − first = (n_pages − 1) · H
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) === (r.getLong(1) - 1) * nHosts,
        s"host ${r.getString(0)} span")
    }
  }

  test("slots are globally unique and the per-host order is by priority") {
    val d = graft.schema.Tables.t(spark, sf001, "documents")
    val hosts = d.select(col("source")).distinct().collect()
      .map(_.getString(0)).sorted.zipWithIndex.toMap
    val h = hosts.size.toLong
    val pages = d.select(col("source"), col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // sequential schedule: per host, sort by (n_chars desc, doc_id)
    val slots = pages.groupBy(_._1).toSeq.flatMap { case (host, ps) =>
      ps.sortBy(p => (-p._3, p._2)).zipWithIndex.map { case (p, i) =>
        (p._2, i.toLong * h + hosts(host)) // (doc_id, slot)
      }.toSeq
    }
    assert(slots.map(_._2).distinct.size === slots.size)
    // the engine's per-host aggregates match the sequential schedule
    val seqAgg = slots.groupBy(s => pages.find(_._2 == s._1).get._1)
      .map { case (host, ss) =>
        host -> (ss.size.toLong, ss.map(_._2).min, ss.map(_._2).max)
      }
    q.collect().foreach { r =>
      val (n, lo, hi) = seqAgg(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === lo && r.getLong(3) === hi,
        s"host ${r.getString(0)}")
    }
  }
}
