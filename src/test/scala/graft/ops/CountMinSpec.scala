package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}
import graft.schema.Tables.t

/** Count-min guarantees the oracle's 20-row hash compare can't express:
  * the one-sided error bound holds for EVERY vocabulary word, and the
  * sketch's cell grid is genuinely fixed-size. */
class CountMinSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // suite-local caches must not outlive the suite: LoopPinSpec /
  // CacheRegistrySpec assert the context carries NO persisted RDDs
  // after clear, in any suite order
  override def afterAll(): Unit = {
    sketch.unpersist(blocking = false)
    wo.unpersist(blocking = false)
    super.afterAll()
  }

  private lazy val wo = t(spark, sf001, "documents")
    .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
    .filter(col("word").rlike("^[a-z]{4,}$"))
    .select(col("word"), md5(col("word")).as("m"))
    .select(col("word"),
      conv(substring(col("m"), 1, 14), 16, 10).cast("long").as("h1"),
      conv(substring(col("m"), 15, 14), 16, 10).cast("long").as("h2"))
    .cache()

  private lazy val sketch = TextAnalysis.countMinSketch(wo).cache()

  test("estimate >= exact count for every vocabulary word (one-sided error)") {
    val vocab = wo.groupBy(col("word"))
      .agg(first(col("h1")).as("h1"), first(col("h2")).as("h2"),
        count(lit(1)).as("exact_cnt"))
    val est = TextAnalysis.countMinEstimate(vocab, sketch)
    assert(est.filter(col("cm_est") < col("exact_cnt")).isEmpty,
      "count-min must never underestimate")
  }

  test("sketch grid is bounded by d*w cells and conserves total mass per row") {
    val cells = sketch.count()
    assert(cells <= 4 * 256, s"grid overflowed: $cells cells")
    val total = wo.count()
    val perRow = sketch.groupBy(col("j")).agg(sum(col("cnt")).as("s")).collect()
    assert(perRow.length == 4)
    assert(perRow.forall(_.getLong(1) == total),
      "every hash row must count every occurrence exactly once")
  }

  test("q129 output rows agree with an independently computed estimate") {
    val rows = SparkEntry.queries("q129_countmin")(spark, sf001).collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)),
      "published estimates must dominate exact counts")
  }
}
