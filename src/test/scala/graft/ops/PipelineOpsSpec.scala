package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the round-8 pipeline operators (q152–q156). Oracle parity
  * is the driver's job; these pin the properties the oracles can't see —
  * equivalence to the naive formulation (q152), statistical sanity
  * (q153/q154), the fusion arithmetic (q155), and classifier invariants
  * (q156). */
class PipelineOpsSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("q152: bucketed range join equals the naive theta join") {
    import graft.schema.Tables.t
    val ev = t(spark, sf001, "events")
      .select(col("event_id"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("us").as("eus"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("us").as("cus"))
    val naive = errors.join(clicks,
        abs(col("cus") - col("eus")) <= 120000000L, "left")
      .groupBy(col("eid")).agg(count(col("cid")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = q("q152_interval_join")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
  }

  test("property: bucketization finds exactly the |Δ|≤W pairs on adversarial boundaries") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // timestamps drawn from a lattice that lands MANY pairs exactly ON
    // the ±W boundary and on bucket edges — the off-by-one places a
    // quantized range join gets wrong
    val W = 10L
    val tsGen = Gen.listOfN(40, Gen.choose(0L, 8L).map(_ * 5L)) // multiples of W/2
    (0 until 8).foreach { i =>
      val times = tsGen.pureApply(Gen.Parameters.default, Seed(23L + i))
      val (errT, clkT) = times.splitAt(20)
      val errs = errT.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("eid", "eus")
      val clks = clkT.zipWithIndex.map { case (t, j) => (100L + j, t) }.toDF("cid", "cus")
      val probes = errs.select(col("eid"), col("eus"),
        explode(expr(s"array(eus DIV $W - 1, eus DIV $W, eus DIV $W + 1)")).as("bkt"))
      val keyed = clks.withColumn("bkt", expr(s"cus DIV $W"))
      val got = probes.join(keyed, Seq("bkt"))
        .filter(abs(col("cus") - col("eus")) <= W)
        .select(col("eid"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length,
        s"case $i: a pair matched in more than one probed bucket")
      val expected = for {
        (et, j) <- errT.zipWithIndex; (ct, k) <- clkT.zipWithIndex
        if math.abs(ct - et) <= W
      } yield (j.toLong, 100L + k)
      assert(got.toSet == expected.toSet, s"case $i: pair sets diverge")
    }
  }

  test("q152: plans as an equi-join on the bucket, never a cartesian") {
    val p = q("q152_interval_join").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to all-pairs:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join on the bucket:\n$p")
  }

  test("q153/q155/q161 plan shapes: salted windows, broadcast query vector, stitched split") {
    // q153: the phase-1 ranking window must partition on (source, salt).
    // Phase 2 legitimately windows on bare source — by then its input is
    // phase-1's ≤ 1600-rows-per-source survivors, not the corpus — so the
    // assertion is "a salted window EXISTS", plus both windows present.
    val p153 = q("q153_zipf_slope").queryExecution.executedPlan.toString
    assert(p153.contains("salt"), s"salted phase-1 window missing:\n$p153")
    assert("windowspecdefinition\\(".r.findAllIn(p153).size >= 2,
      s"expected the two-phase window pair:\n$p153")
    // q155: the one-row query vector rides a broadcast, candidates never
    // come from a cartesian over the corpus
    val p155 = q("q155_hybrid_rrf").queryExecution.executedPlan.toString
    assert(p155.contains("BroadcastExchange"), s"query vector not broadcast:\n$p155")
    // the top-20 cuts are per-partition heaps (TakeOrderedAndProject),
    // never a global-ORDER-BY window over the corpus-scale candidate
    // lists (ADVICE r8) — the rank windows run over the 20 survivors
    assert(p155.contains("TakeOrderedAndProject"),
      s"q155 top-20 cut is not TakeOrderedAndProject:\n$p155")
    // q161: the per-source ranking runs on the stitch engine (its
    // __bucket working column is in the plan), not a per-source window
    val p161 = q("q161_exact_stratified_split").queryExecution.executedPlan.toString
    assert(p161.contains("__bucket"), s"stitch engine missing from q161:\n$p161")
  }

  test("q153: one slope per source, negative (rank-frequency decays)") {
    val rows = q("q153_zipf_slope").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val slope = r.getAs[Double]("zipf_slope")
      assert(slope < 0.0, s"source ${r.get(0)} slope $slope not negative")
      assert(slope > -5.0, s"source ${r.get(0)} slope $slope implausibly steep")
    }
  }

  test("q154: importance weights rank target-language docs to the top") {
    val top = q("q154_dsir_importance").collect()
    assert(top.length == 25)
    val enShare = top.count(_.getAs[String]("lang") == "en")
    // the target slice must dominate its own importance ranking
    assert(enShare >= 13, s"only $enShare/25 top-importance docs are 'en'")
    val ws = top.map(_.getAs[Double]("dsir_logw"))
    assert(ws.sameElements(ws.sorted.reverse), "not sorted by weight desc")
  }

  test("q155: rrf score matches the rank arithmetic on every row") {
    q("q155_hybrid_rrf").collect().foreach { r =>
      val rb = Option(r.getAs[java.lang.Long]("bm25_rank")).map(_.toLong)
      val rc = Option(r.getAs[java.lang.Long]("cos_rank")).map(_.toLong)
      val expected = rb.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rc.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      val got = r.getAs[Double]("rrf_score")
      assert(math.abs(got - expected) < 1e-6, s"row $r: $got vs $expected")
      assert(rb.isDefined || rc.isDefined, s"row $r in neither list")
    }
  }

  test("q157: equi-depth buckets cover all rows with near-equal depth, no global window") {
    val rows = q("q157_equidepth_histogram").collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getAs[Long]("n_rows"))
    assert(counts.max - counts.min <= 1, s"buckets not equi-depth: ${counts.toSeq}")
    val los = rows.map(_.getAs[Double]("lo"))
    val his = rows.map(_.getAs[Double]("hi"))
    rows.indices.foreach(i => assert(los(i) <= his(i)))
    assert(his.zip(los.drop(1)).forall { case (h, l) => h <= l },
      "bucket ranges overlap beyond the boundary")
    // the scale property: rank comes from the stitch engine (its __bucket
    // partition key is in the window spec), not an unpartitioned
    // row_number window over the corpus
    val p = q("q157_equidepth_histogram").queryExecution.executedPlan.toString
    assert(p.contains("__bucket"), s"stitch engine missing from plan:\n$p")
    assert(!p.contains("windowspecdefinition(value"),
      s"global-window ntile shape leaked back:\n$p")
  }

  test("q168: weighted deciles equal the hand-rolled weighted quantile fold") {
    import graft.schema.Tables.t
    val got = q("q168_weighted_deciles").collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Double]("value"))).toSeq
    assert(got.map(_._1) == (1L to 9L), s"decile keys: ${got.map(_._1)}")
    assert(got.map(_._2).sliding(2).forall(p => p.head <= p.last),
      "weighted decile values not non-decreasing")
    // reference: sort collected (v, w) and walk cumulative weight —
    // first v whose 10·cum ≥ d·W, exactly the integer-threshold rule
    val vw = t(spark, sf001, "lineitem")
      .select(col("l_extendedprice"), col("l_quantity").cast("long"),
        col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._3, t._4))
    val totW = vw.map(_._2).sum
    var cum = 0L
    val it = vw.iterator
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var d = 1L
    while (it.hasNext && d <= 9) {
      val (v, w, _, _) = it.next()
      cum += w
      while (d <= 9 && cum * 10 >= d * totW) { expected += ((d, v)); d += 1 }
    }
    assert(got == expected.toSeq, s"got $got\nexpected $expected")
    // scale shape: the cumulative weight rides the stitch engine
    val p = q("q168_weighted_deciles").queryExecution.executedPlan.toString
    assert(p.contains("__bucket"), s"stitch engine missing from plan:\n$p")
  }

  test("q169: sessions are gap-consistent and partition each user's events") {
    import graft.schema.Tables.t
    val sessions = q("q169_batch_sessionize").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sid"),
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_sec")))
    // recompute from raw events: per-user sorted stream, cut at >30 min
    val ev = t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).toSeq
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
      var prev = Long.MinValue
      sorted.foreach { case (_, us, _) =>
        if (prev != Long.MinValue && us - prev > 1800000000L) {
          sessions += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty[Long]
        }
        cur += us; prev = us
      }
      if (cur.nonEmpty) sessions += cur.toSeq
      sessions.zipWithIndex.map { case (ss, i) =>
        (uid, (i + 1).toLong, ss.size.toLong, (ss.max - ss.min) / 1000000L)
      }
    }.toSet
    assert(sessions.toSet == expected, "session boundaries diverge from the fold")
    // every user's events are fully covered, no session double-counts
    val perUser = sessions.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val evPerUser = ev.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(perUser == evPerUser, "session event counts don't partition the stream")
  }

  test("q170: uniqUpTo saturates at N+1 and is exact below the cap") {
    import graft.schema.Tables.t
    val got = q("q170_uniq_upto").collect()
      .map(r => (r.getString(0), r.getAs[Long]("u5"), r.getAs[Long]("u200"))).toSeq
    val exact = t(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("d")).toMap
    assert(got.nonEmpty)
    got.foreach { case (et, u5, u200) =>
      val d = exact(et)
      assert(u5 == math.min(d, 6L), s"$et: u5=$u5 for exact $d")
      assert(u200 == math.min(d, 201L), s"$et: u200=$u200 for exact $d")
      // sf0.001 has 15 users total: the N=5 cap must actually saturate
      // somewhere and N=200 must stay exact, or the test checks nothing
    }
    assert(got.exists(_._2 == 6L), "N=5 cap never saturated — fixture too small")
    assert(got.forall { case (et, _, u200) => u200 == exact(et) },
      "N=200 should be exact at sf0.001")
  }

  test("q171: canonical sumMap string equals the per-user type counts") {
    import graft.schema.Tables.t
    val got = q("q171_sum_map").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_types"), r.getString(2))).toSeq
    val raw = t(spark, sf001, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = raw.groupBy(_._1).view.mapValues { rows =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      (counts.size.toLong, counts.map { case (k, v) => s"$k:$v" }.mkString(","))
    }.toMap
    assert(got.size == expected.size)
    got.foreach { case (uid, n, str) =>
      assert((n, str) == expected(uid), s"user $uid: ($n, $str) vs ${expected(uid)}")
    }
  }

  test("approximate deciles track q157's exact bucket edges (sketch path)") {
    import graft.schema.Tables.t
    // percentile_approx is the mergeable-sketch answer a streaming or
    // pre-aggregated rollup would keep; it must land inside (or at worst
    // adjacent to) the exact equi-depth bucket for every decile
    val exact = q("q157_equidepth_histogram").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .sortBy(_._1)
    val approx = t(spark, sf001, "events")
      .agg(expr("percentile_approx(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)"))
      .head().getSeq[Double](0)
    approx.zipWithIndex.foreach { case (qv, i) =>
      // decile i is the boundary between bucket i and i+1: allow the
      // neighborhood [lo(i), hi(i+1)]
      val lo = exact(i)._2
      val hi = exact(math.min(i + 1, exact.length - 1))._3
      assert(qv >= lo && qv <= hi,
        s"approx decile ${i + 1} = $qv outside exact neighborhood [$lo, $hi]")
    }
  }

  test("q158: moving average matches a hand-rolled fold per user") {
    import graft.schema.Tables.t
    val ev = t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).toSeq
      sorted.zipWithIndex.map { case ((_, eid, _, _), i) =>
        val frame = sorted.slice(math.max(0, i - 2), i + 1).map(_._4)
        eid -> BigDecimal(frame.sum / frame.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = q("q158_moving_avg").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mavg3")).toMap
    assert(got.size == expected.size)
    val mismatches = expected.collect {
      case (eid, e) if math.abs(got(eid) - e) > 1e-9 => (eid, e, got(eid))
    }
    assert(mismatches.isEmpty, s"mismatched rows: ${mismatches.take(5)}")
  }

  test("q159: forward as-of equals the naive per-row subquery semantics") {
    import graft.schema.Tables.t
    val ev = t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val expected = ev.filter(_._3 == "error").map { case (uid, eid, _, us) =>
      val nexts = clicks.filter(c => c._1 == uid && c._4 >= us &&
        c._4 <= us + 600000000L).map(_._4)
      eid -> (if (nexts.isEmpty) None else Some(nexts.min))
    }.toMap
    val got = q("q159_asof_forward")
      .select(col("event_id"),
        expr("unix_micros(CAST(next_click_ts AS TIMESTAMP))").as("nus"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == expected)
  }

  test("q160: shuffle positions are a permutation, stable across runs") {
    val a = q("q160_corpus_shuffle").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.map(_._2).sorted.sameElements(1L to a.length.toLong),
      "positions are not a 1..N permutation")
    val b = q("q160_corpus_shuffle").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.toMap == b.toMap, "shuffle is not reproducible across runs")
    // shuffled: the permutation must not be the identity order
    assert(a.count { case (id, pos) => id + 1 == pos } < a.length / 10)
  }

  test("q161: split proportions are exact per source") {
    val rows = q("q161_exact_stratified_split").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("split")))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val n = rs.length.toLong
      val bySplit = rs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(bySplit.getOrElse("train", 0L) == n * 8 / 10,
        s"$src train ${bySplit.get("train")} != ${n * 8 / 10}")
      assert(bySplit.getOrElse("val", 0L) == n * 9 / 10 - n * 8 / 10)
      assert(bySplit.getOrElse("test", 0L) == n - n * 9 / 10)
    }
  }

  test("q162: masked input + targets reconstruct the original document") {
    import graft.schema.Tables.t
    val original = t(spark, sf001, "documents")
      .select(col("doc_id"), expr("""array_join(split(lower(trim(text)), '\\s+'), ' ')"""))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentinelRe = "<extra_id_([0-9]+)>".r
    q("q162_span_corruption").collect().foreach { r =>
      val (id, nSpans, masked, target) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))
      // sentinels appear once each, in order, in BOTH masked and target
      val mIds = sentinelRe.findAllMatchIn(masked).map(_.group(1).toLong).toSeq
      val tIds = sentinelRe.findAllMatchIn(target).map(_.group(1).toLong).toSeq
      assert(mIds == (0L until nSpans) && tIds == (0L until nSpans),
        s"doc $id sentinel sequence broken: $mIds / $tIds")
      // splice each target span back into its sentinel slot → original
      val spans = if (nSpans == 0) Map.empty[Long, String]
        else target.split("<extra_id_").filter(_.nonEmpty).map { seg =>
          val Array(k, words) = seg.split(">", 2)
          k.toLong -> words.trim
        }.toMap
      val rebuilt = sentinelRe.replaceAllIn(masked,
        m => java.util.regex.Matcher.quoteReplacement(spans(m.group(1).toLong)))
      assert(rebuilt == original(id), s"doc $id does not reconstruct")
    }
  }

  test("q165: cohort matrix invariants — offset 0 is the cohort census") {
    import graft.schema.Tables.t
    val rows = q("q165_cohort_retention").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._2 >= 0), "negative week offset")
    // offset 0 counts every user of the cohort (their first event is in it)
    val cohortSizes = t(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("c"))
      .groupBy(col("c")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val offset0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    assert(offset0 == cohortSizes,
      s"offset-0 rows $offset0 != cohort census $cohortSizes")
    // retention can never exceed the cohort's size in any later week
    rows.foreach { case (c, off, n) =>
      assert(n <= cohortSizes(c), s"cohort $c offset $off counts $n > census")
    }
  }

  test("q163: argMax tiebreak is deterministic on planted value ties") {
    val s = spark
    import s.implicits._
    // two rows tie on value for user 1 — the struct key must pick the
    // higher event_id ("b"), never whichever partition answered first
    val df = Seq((1L, 10L, "a", 5.0), (1L, 20L, "b", 5.0), (1L, 15L, "c", 1.0))
      .toDF("user_id", "event_id", "event_type", "value")
    val key = struct(col("value"), col("event_id"))
    val row = df.groupBy(col("user_id"))
      .agg(max_by(col("event_type"), key).as("top"),
        min_by(col("event_type"), key).as("bottom"))
      .collect().head
    assert(row.getString(1) == "b" && row.getString(2) == "c")
  }

  test("q156: scores bounded in [-1, 1), keep consistent with sign") {
    q("q156_quality_classifier").collect().foreach { r =>
      val score = r.getAs[Double]("quality_score")
      assert(score >= -1.0 && score < 1.0, s"score $score out of range")
      assert(r.getAs[Boolean]("keep") == score > 0 ||
        math.abs(score) < 1e-6, // keep keys on the unrounded sum near 0
        s"keep flag inconsistent at $score")
    }
  }
}
