package graft.ops

import org.apache.spark.sql.functions._

/** q342 semantic eval-decontamination: a driver-side brute-force
  * recomputation (exact max-cosine + min-id-at-max tiebreak over the
  * `% 97` eval slice), the one-sided threshold contract, and the
  * broadcast plan shape — the corpus side must never shuffle into a
  * CartesianProduct. */
class SemanticDecontamSpec extends graft.SparkSpec {

  private val Tau = 0.35

  test("flagged set matches a sequential max-cosine recomputation") {
    val s = spark
    import s.implicits._
    val all = VectorSearch.embTable(s, sf001)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    val (ev, tr) = all.partition(_._1 % 97 == 0)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      // left-to-right folds, exactly like graft_dot / list_sum
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = tr.flatMap { case (id, e, lab) =>
      val scored = ev.map { case (eid, ee, elab) => (cos(e, ee), eid, elab) }
      val mc = scored.map(_._1).max
      val (_, eid, elab) = scored.filter(_._1 == mc).minBy(_._2)
      if (mc >= Tau) Some(id -> (lab.toLong, eid, elab.toLong,
        BigDecimal(mc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }.toMap
    val q = graft.SparkEntry.queries("q342_semantic_decontam")(s, sf001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(q.keySet === expected.keySet)
    expected.foreach { case (id, e) => assert(q(id) === e, s"vec $id") }
    assert(q.nonEmpty)
  }

  test("threshold is one-sided and eval vectors never self-flag") {
    val rows = graft.SparkEntry.queries("q342_semantic_decontam")(spark, sf001)
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(5) >= Tau - 5e-7, r.getLong(0).toString)
      assert(r.getLong(0) % 97 !== 0L)
      assert(r.getLong(2) % 97 === 0L)
      assert(r.getBoolean(4) === (r.getLong(1) == r.getLong(3)))
    }
    // presentation order: cosine descending, then vec_id
    val keys = rows.map(r => (-r.getDouble(5), r.getLong(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("plan broadcasts the eval side — no CartesianProduct") {
    val p = graft.SparkEntry.queries("q342_semantic_decontam")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"eval side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"corpus-side cartesian:\n$p")
  }
}
