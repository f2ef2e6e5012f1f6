package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

/** q228's attribution semantics on a planted timeline: first- vs
  * last-touch credit, the '(none)' fallback for an untouched purchase,
  * and conservation (each model distributes exactly the total purchase
  * revenue and count). */
class AttributionSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  test("first/last-touch credit, (none) fallback, conservation") {
    val s = spark
    import s.implicits._
    // user 1: click → view → purchase(10) → purchase(5)
    //   first-touch: click/click; last-touch: view/view
    // user 2: purchase(7) with no prior touch → (none)/(none)
    // user 3: view → purchase(2); a LATER click must not matter
    val ev = Seq(
      (1L, ts(1), 10L, "click", 0.0),
      (1L, ts(2), 11L, "view", 0.0),
      (1L, ts(3), 12L, "purchase", 10.0),
      (1L, ts(4), 13L, "purchase", 5.0),
      (2L, ts(1), 20L, "purchase", 7.0),
      (3L, ts(1), 30L, "view", 0.0),
      (3L, ts(2), 31L, "purchase", 2.0),
      (3L, ts(9), 32L, "click", 0.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")

    val r = PipelineOps.attribution(ev)
      .as[(String, String, Long, Double)].collect()
      .map(x => (x._1, x._2) -> (x._3, x._4)).toMap

    assert(r(("first_touch", "click")) == ((2L, 15.0)))
    assert(r(("first_touch", "view")) == ((1L, 2.0)))
    assert(r(("first_touch", "(none)")) == ((1L, 7.0)))
    assert(r(("last_touch", "view")) == ((3L, 17.0)))
    assert(r(("last_touch", "(none)")) == ((1L, 7.0)))
    assert(!r.contains(("last_touch", "click")))

    // conservation: each model carries all 4 conversions, 24.0 revenue
    for (m <- Seq("first_touch", "last_touch")) {
      val rows = r.filter(_._1._1 == m).values
      assert(rows.map(_._1).sum == 4L)
      assert(math.abs(rows.map(_._2).sum - 24.0) < 1e-9)
    }
  }
}
