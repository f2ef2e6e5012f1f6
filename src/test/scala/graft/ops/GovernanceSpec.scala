package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-positive behavior of the governance operators: the oracle run
  * over the synthetic corpus proves the no-false-positive direction (every
  * count 0, redacted_md5 == md5(text)); these tests prove detection and
  * redaction actually fire when PII is present. */
class GovernanceSpec extends SparkSpec {

  test("piiReport detects and redacts planted emails, phones, IPv4s") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "contact Jo.Smith+spam@mail.example.org or call 555-123-4567 now"),
      (2L, "server at 10.0.255.7 and backup 192.168.1.1, ticket 123.456.7890"),
      (3L, "no pii here, just words and the number 1234567"),
      (4L, "a@b.io x@y.co two emails one line")
    ).toDF("doc_id", "text")
    val r = Governance.piiReport(docs).orderBy("doc_id")
      .select("n_email", "n_phone", "n_ipv4").as[(Long, Long, Long)].collect()
    assert(r(0) == ((1L, 1L, 0L)))
    // 123.456.7890 must resolve as a PHONE (dot-separated), not an IPv4
    assert(r(1) == ((0L, 1L, 2L)))
    assert(r(2) == ((0L, 0L, 0L)))
    assert(r(3) == ((2L, 0L, 0L)))

    val red = docs.select(col("doc_id"), Governance.redactCol(col("text")).as("t"))
      .orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    assert(red(0) == "contact <EMAIL> or call <PHONE> now")
    assert(red(1) == "server at <IP> and backup <IP>, ticket <PHONE>")
    assert(red(2) == "no pii here, just words and the number 1234567")
    assert(red(3) == "<EMAIL> <EMAIL> two emails one line")
  }

  test("redaction is idempotent: a redacted text has nothing left to redact") {
    val s = spark
    import s.implicits._
    val once = Seq((1L, "mail a@b.io ip 1.2.3.4 tel 999-555-0100 end"))
      .toDF("doc_id", "text")
      .select(Governance.redactCol(col("text")).as("text"))
    val twice = once.select(Governance.redactCol(col("text")).as("text"))
    assert(once.as[String].head() == twice.as[String].head())
  }

  test("q235: risk is monotone non-increasing in privacy (higher k ⇒ more exposure, never less)") {
    val rows = graft.SparkEntry.queries("q235_k_anonymity")(spark, sf001)
      .orderBy("k").collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == Seq(2, 5, 10, 20))
    val classes = rows.map(_.getAs[Long]("n_classes")).distinct
    assert(classes.length == 1, "class count is k-independent")
    val small = rows.map(_.getAs[Long]("n_small"))
    val risk = rows.map(_.getAs[Long]("n_rows_at_risk"))
    assert(small.sameElements(small.sorted) && risk.sameElements(risk.sorted),
      "raising k can only add at-risk classes/rows")
    rows.foreach(r => assert(r.getAs[Long]("n_rows_at_risk") >=
      r.getAs[Long]("n_small"), "each small class holds ≥ 1 row"))
  }

  test("q238: the DP release is deterministic across reruns and the noise is bounded sane") {
    val a = graft.SparkEntry.queries("q238_dp_counts")(spark, sf001).collect()
    val b = graft.SparkEntry.queries("q238_dp_counts")(spark, sf001).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "same group key must always draw the same noise (idempotent release)")
    a.foreach { r =>
      val noise = r.getAs[Double]("noise")
      // Laplace(b=2): |noise| = 2*|ln(u')| — astronomically unlikely past
      // ~70 (u' < 1e-15 is clamped), and 0 only on the u=1/2 null set
      assert(math.abs(noise) > 0.0 && math.abs(noise) < 70.0)
      assert(math.abs(r.getAs[Double]("n_dp") - r.getAs[Long]("n") - noise) < 1e-9)
    }
  }
}
