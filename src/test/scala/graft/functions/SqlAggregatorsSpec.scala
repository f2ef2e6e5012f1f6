package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The mergeable sketch Aggregators resolved from SQL TEXT through
  * GraftExtensions (VERDICT r9 item 4) — no Scala, no imperative
  * registration: the test session only carries
  * `spark.sql.extensions=graft.GraftExtensions`, exactly like a
  * SQL-only client would. */
class SqlAggregatorsSpec extends SparkSpec {

  test("graft_topk from SQL: candidates contain every heavy hitter") {
    val s = spark
    import s.implicits._
    // zipf-ish: item i appears 200/i times, i in 1..40 → n ≈ 858
    val rows = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"w$i"))
    rows.toDF("item").createOrReplaceTempView("topk_in")
    val cands = s.sql("SELECT graft_topk(item, 8) AS cands FROM topk_in")
      .head().getSeq[String](0)
    val n = rows.length
    val exact = rows.groupBy(identity).view.mapValues(_.size)
    val heavy = exact.filter(_._2 > n / 8).keys.toSet
    assert(heavy.nonEmpty)
    assert(heavy.subsetOf(cands.toSet),
      s"missing heavy hitters: ${heavy -- cands.toSet}")
    assert(cands.size <= 16, "candidate list exceeds the 2k bound")
    // the two-pass exact top-N, in pure SQL over the SQL-produced sketch
    val top3 = s.sql(
      """WITH c AS (SELECT explode(graft_topk(item, 8)) AS item FROM topk_in)
        |SELECT i.item FROM topk_in i JOIN c USING (item)
        |GROUP BY i.item ORDER BY count(*) DESC, i.item LIMIT 3""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(top3 == Seq("w1", "w2", "w3"))
  }

  test("graft_topk_weighted from SQL: weighted heavy hitters retained") {
    val s = spark
    import s.implicits._
    val rows = (1 to 30).map(i => (s"w$i", (500 / i).toLong))
    rows.toDF("item", "wt").createOrReplaceTempView("topkw_in")
    val cands = s.sql(
      "SELECT graft_topk_weighted(item, wt, 8) AS cands FROM topkw_in")
      .head().getSeq[String](0)
    val w = rows.map(_._2).sum
    val heavy = rows.filter(_._2 > w / 8).map(_._1).toSet
    assert(heavy.nonEmpty)
    assert(heavy.subsetOf(cands.toSet),
      s"missing weighted heavy hitters: ${heavy -- cands.toSet}")
  }

  test("graft_uniq_upto from SQL matches least(count distinct, n+1) per group") {
    val s = spark
    import s.implicits._
    // group g has g distinct values — crosses the n=3 saturation point
    val rows = (1 to 6).flatMap(g => (1 to g).map(v => (g, v.toLong)))
    rows.toDF("g", "x").createOrReplaceTempView("uut_in")
    val got = s.sql(
      """SELECT g, graft_uniq_upto(x, 3) AS u FROM uut_in
        |GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val exp = (1 to 6).map(g => (g, math.min(g, 4).toLong))
    assert(got == exp)
    // int input implicitly casts to the aggregator's LONG input
    val gotInt = s.sql("SELECT graft_uniq_upto(g, 10) AS u FROM uut_in")
      .head().getLong(0)
    assert(gotInt == 6L)
  }

  test("non-literal sketch size is rejected at plan time") {
    val s = spark
    import s.implicits._
    Seq(("a", 2)).toDF("item", "k").createOrReplaceTempView("badk_in")
    val e = intercept[Exception] {
      s.sql("SELECT graft_topk(item, k) FROM badk_in").collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"unexpected error: ${e.getMessage}")
  }
}
