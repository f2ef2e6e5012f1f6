package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.schema.Tables

/** The two scale techniques SCALE.md promises beyond what AQE gives for
  * free: bucketed co-located joins (no exchange at all) and salted joins
  * for hot keys (same results, spread reducers). */
class ScaleTechniquesSpec extends SparkSpec {

  test("bucketed tables join without any Exchange") {
    val s = spark
    val li = Tables.t(s, sf001, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.t(s, sf001, "orders").select("o_orderkey", "o_totalprice")
    s.sql("DROP TABLE IF EXISTS li_bucketed")
    s.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    // force a sort-merge join: tiny test tables would broadcast, and the
    // planner disables bucketed scans for broadcast joins
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("li_bucketed")
        .join(s.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join returns identical results to the plain join") {
    val s = spark
    val li = Tables.t(s, sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.t(s, sf001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "l_linenumber", 8)
    assert(salted.count() == plain.count())
    assert(salted.select(sum("l_quantity"), sum("o_totalprice")).collect().head ==
      plain.select(sum("l_quantity"), sum("o_totalprice")).collect().head)
    assert(salted.exceptAll(plain).isEmpty)
  }
}
