package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contracts of the q206–q208 model-eval family that the oracle cannot
  * state: the ROC curve must integrate to the midrank AUC, bins must
  * partition the population, PSI terms are individually non-negative. */
class ModelEvalSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("q206: monotone curve, endpoints, trapezoid AUC equals midrank AUC") {
    val curve = q("q206_roc_curve").collect()
      .map(r => (r.getAs[Double]("fpr"), r.getAs[Double]("tpr"),
        r.getAs[Long]("tp"), r.getAs[Long]("fn"),
        r.getAs[Long]("fp"), r.getAs[Long]("tn")))
    assert(curve.nonEmpty)
    val (np, nn) = (curve.head._3 + curve.head._4, curve.head._5 + curve.head._6)
    curve.foreach { case (fpr, tpr, tp, fn, fp, tn) =>
      assert(tp + fn == np && fp + tn == nn, "confusion rows must partition")
      assert(fpr >= 0 && fpr <= 1 && tpr >= 0 && tpr <= 1)
    }
    // thresholds ascend → (fpr, tpr) descend monotonically
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 <= a._1 + 1e-12 && b._2 <= a._2 + 1e-12, "curve not monotone")
    }
    // trapezoid over the full curve incl. the implicit (0,0) endpoint
    val pts = ((0.0, 0.0) +: curve.map(c => (c._1, c._2)).reverse.toSeq).distinct
    val trap = pts.sliding(2).map {
      case Seq((x0, y0), (x1, y1)) => (x1 - x0) * (y0 + y1) / 2
      case _ => 0.0
    }.sum
    // midrank AUC from raw data (sequential, plain Scala)
    val data = graft.schema.Tables.t(spark, sf001, "events")
      .select(col("value"), (col("event_type") === "purchase").as("y"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    val ranks = data.map(_._1).groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy(_._1)
      .foldLeft((0L, Map.empty[Double, Double])) { case ((c, m), (v, k)) =>
        (c + k, m + (v -> (c + (k + 1) / 2.0)))
      }._2
    val posRanks = data.filter(_._2).map(e => ranks(e._1))
    val nP = posRanks.length.toDouble; val nN = data.length - nP
    val aucMid = (posRanks.sum - nP * (nP + 1) / 2) / (nP * nN)
    assert(math.abs(trap - aucMid) < 1e-9,
      s"trapezoid AUC $trap != midrank AUC $aucMid")
  }

  test("q207: bins partition the population; rates and predictions in [0, 1]") {
    val rows = q("q207_calibration_bins").collect()
    val total = graft.schema.Tables.t(spark, sf001, "events").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_pred") >= 0 && r.getAs[Double]("mean_pred") <= 1)
      assert(r.getAs[Double]("obs_rate") >= 0 && r.getAs[Double]("obs_rate") <= 1)
      assert(math.abs(r.getAs[Double]("gap")
        - (r.getAs[Double]("mean_pred") - r.getAs[Double]("obs_rate"))) < 1e-12)
    }
  }

  test("q208: every PSI term non-negative, total is their sum, probabilities sum to ~1") {
    val rows = q("q208_psi").collect()
    val terms = rows.map(_.getAs[Double]("term"))
    terms.foreach(t => assert(t >= 0.0, s"(pa-pb)ln(pa/pb) must be >= 0, got $t"))
    val total = rows.head.getAs[Double]("psi_total")
    assert(math.abs(terms.sum - total) < 1e-5)
    // empty bins carry the 0.5-count continuity correction, so each sum
    // may exceed 1 by up to bins·0.5/n — never fall below 1
    val slack = rows.length * 0.5 / 100.0
    val sa = rows.map(_.getAs[Double]("pa")).sum
    val sb = rows.map(_.getAs[Double]("pb")).sum
    assert(sa >= 1.0 - 1e-9 && sa <= 1.0 + slack, s"pa sum $sa")
    assert(sb >= 1.0 - 1e-9 && sb <= 1.0 + slack, s"pb sum $sb")
  }

  test("q210: GD matches a sequential recompute, reduces loss, moves toward the OLS slope") {
    val row = q("q210_gd_linreg").collect().head
    val (w, b) = (row.getAs[Double]("w"), row.getAs[Double]("b"))
    val data = graft.schema.Tables.t(spark, sf001, "lineitem")
      .select(col("l_quantity").cast("double") / 50, col("l_extendedprice").cast("double") / 100000)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = data.length.toDouble
    def mse(wk: Double, bk: Double): Double =
      data.map { case (x, y) => math.pow(wk * x + bk - y, 2) }.sum / n
    var (ws, bs) = (0.0, 0.0)
    var losses = List(mse(ws, bs))
    for (_ <- 1 to 3) {
      val gw = data.map { case (x, y) => x * (ws * x + bs - y) }.sum
      val gb = data.map { case (x, y) => ws * x + bs - y }.sum
      ws = BigDecimal(ws - 0.5 * gw / n).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      bs = BigDecimal(bs - 0.5 * gb / n).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      losses ::= mse(ws, bs)
    }
    assert(math.abs(w - ws) < 1e-6 && math.abs(b - bs) < 1e-6,
      s"distributed ($w, $b) != sequential ($ws, $bs)")
    // full-batch GD with a sane step must descend every round here
    losses.reverse.sliding(2).foreach { case List(l0, l1) =>
      assert(l1 < l0, s"loss went up: $l0 -> $l1")
    case _ => ()
    }
    assert(math.abs(row.getAs[Double]("mse") - mse(ws, bs)) < 1e-6)
    // price grows with quantity: the learned slope must be positive like OLS's
    assert(w > 0.0)
  }

  test("q211: logistic GD matches a sequential recompute; loss and accuracy sane") {
    val row = q("q211_gd_logreg").collect().head
    val (w, b) = (row.getAs[Double]("w"), row.getAs[Double]("b"))
    val data = graft.schema.Tables.t(spark, sf001, "events")
      .select(col("value").cast("double") / 500,
        (col("event_type") === "purchase").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = data.length.toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var (ws, bs) = (0.0, 0.0)
    for (_ <- 1 to 3) {
      val ps = data.map { case (x, _) => r6(1.0 / (1.0 + math.exp(-(ws * x + bs)))) }
      val gw = data.zip(ps).map { case ((x, y), p) => x * (p - y) }.sum
      val gb = data.zip(ps).map { case ((_, y), p) => p - y }.sum
      ws = r9(ws - 2.0 * gw / n)
      bs = r9(bs - 2.0 * gb / n)
    }
    assert(math.abs(w - ws) < 1e-6 && math.abs(b - bs) < 1e-6,
      s"distributed ($w, $b) != sequential ($ws, $bs)")
    val correct = row.getAs[Long]("correct")
    // ~20% of events are purchases: predicting "not purchase" everywhere
    // is ~80% accurate; the trained model must not be WORSE than chance
    // around that majority rate, and log-loss must beat the w=b=0 ln(2)
    assert(correct >= (0.7 * n).toLong, s"accuracy ${correct / n} degenerate")
    assert(row.getAs[Double]("logloss") < math.log(2.0),
      s"log-loss ${row.getAs[Double]("logloss")} no better than the zero model")
  }

  test("q255: AP and best F1 match a sequential descending-threshold pass") {
    import org.apache.spark.sql.functions._
    def rnd(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val rows = graft.schema.Tables.t(spark, sf001, "events")
      .select(col("value"), (col("event_type") === "purchase").cast("int"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val np = rows.map(_._2.toLong).sum
    val byScore = rows.groupBy(_._1).map { case (v, es) =>
      (v, es.length.toLong, es.map(_._2.toLong).sum)
    }.toSeq.sortBy(-_._1)
    var tp = 0L; var k = 0L
    var ap = BigDecimal(0); var bestF1 = 0.0; var bestThr = Double.MaxValue
    byScore.foreach { case (v, cnt, pos) =>
      tp += pos; k += cnt
      ap += rnd((pos.toDouble / np) * (tp.toDouble / k), 9)
      val f1 = rnd(2.0 * tp / (k + np), 9).toDouble
      if (f1 > bestF1 || (f1 == bestF1 && v < bestThr)) { bestF1 = f1; bestThr = v }
    }
    val r = graft.SparkEntry.queries("q255_pr_curve")(spark, sf001).collect().head
    assert(r.getLong(0) === np)
    assert(r.getLong(2) === byScore.length.toLong)
    assert(r.getDouble(3) === rnd(ap.toDouble, 6).toDouble)
    assert(r.getDouble(4) === rnd(bestF1, 6).toDouble)
    assert(r.getDouble(5) === bestThr)
    // AP of a useful ranking beats the prevalence-random baseline floor 0
    assert(r.getDouble(3) > 0.0 && r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
  }

  test("q267 pinball GD: coverage converges toward tau and beats the start") {
    val r = graft.SparkEntry.queries("q267_quantile_regression")(spark, sf001)
      .collect().head
    val coverage = r.getDouble(2)
    val pinball = r.getDouble(3)
    // subgradient equilibrium puts ~tau of the mass at or under the line
    assert(coverage > 0.8 && coverage < 0.98, s"coverage $coverage far from 0.9")
    // the y ≥ 0 start (w=0, b=0) has pinball = 0.9·mean(y); training must
    // have cut it substantially
    val meanY = graft.schema.Tables.t(spark, sf001, "lineitem")
      .select(avg(col("l_extendedprice").cast("double") / 100000)).collect()
      .head.getDouble(0)
    assert(pinball < 0.5 * 0.9 * meanY,
      s"pinball $pinball did not descend from the 0.9·mean(y) start")
  }
}
