package graft.ops

import org.apache.spark.sql.functions._

/** Hashed-classifier inference: the distributed score must equal a
  * sequential JVM recomputation of the same hash→bucket→weight→sum
  * chain, and the keep/drop label must be derived from the score. */
class ClassifierOpsSpec extends graft.SparkSpec {

  private def referenceScore(text: String): (Long, Long) = {
    val words = text.toLowerCase.trim.split("\\s+", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val scores = words.sliding(2).filter(_.length == 2).map { pair =>
      val d = md.digest(pair.mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // h1 = first 7 digest bytes (14 hex digits), as graft_md5_split
      var h1 = 0L
      (0 until 7).foreach(i => h1 = (h1 << 8) | (d(i) & 0xffL))
      val bk = h1 % ClassifierOps.Buckets
      (bk * 2654435761L) % 1001L - 500L
    }.toSeq
    (scores.size.toLong, scores.sum)
  }

  test("q313 equals the sequential reference on real documents") {
    val docs = graft.schema.Tables.t(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.SparkEntry.queries("q313_hashed_classifier")(spark, sf001)
      .collect()
    assert(rows.length === docs.count(_._2.trim.split("\\s+").length >= 2))
    rows.take(40).foreach { r =>
      val (n, score) = referenceScore(docs(r.getLong(0)))
      assert(r.getLong(1) === n, s"doc ${r.getLong(0)} bigram count")
      assert(r.getLong(2) === score, s"doc ${r.getLong(0)} score")
      assert(r.getString(3) === (if (score > 0) "keep" else "drop"))
    }
  }

  test("the aggregate is partial (map-side combine before the exchange)") {
    val plan = graft.SparkEntry.queries("q313_hashed_classifier")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "hash aggregate expected")
    assert(!plan.toLowerCase.contains("cartesian"), "no cartesian product")
  }
}
