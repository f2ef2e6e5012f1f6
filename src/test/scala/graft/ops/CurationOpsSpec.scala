package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the round-5 curation operators (q113–q118)
  * on real testdata — the oracle proves value equality; these prove the
  * properties the oracle can't see (dominance, monotonicity, coverage). */
class CurationOpsSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("q113 semantic dedup: keep-first rule and threshold hold on every row") {
    val rows = q("q113_semantic_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pruned, cluster, maxCos, dupOf) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(dupOf < pruned, s"keep-first violated: $dupOf !< $pruned")
      assert(maxCos >= 0.4 && maxCos <= 1.0, s"cos out of band: $maxCos")
      // k scales with the corpus: seeds = ceil(N / SemDedupTarget)
      val k = math.max(1L, math.ceil(
        spark.read.parquet(s"$sf001/embeddings.parquet").count() /
          VectorSearch.SemDedupTarget.toDouble).toLong)
      assert(cluster >= 0 && cluster < k)
    }
    // pruned ids are unique (one row per pruned vector, not per pair)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("q114 bigram LM: every doc with >=2 words scored, all logprobs negative") {
    val out = q("q114_bigram_logprob").collect()
    val eligible = spark.read.parquet(s"$sf001/documents.parquet")
      .select(size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .filter(col("n") >= 2).count()
    assert(out.length === eligible)
    out.foreach { r =>
      assert(r.getLong(1) >= 1) // n_bigrams
      assert(r.getDouble(2) < 0.0, s"logprob must be negative: ${r.getDouble(2)}")
    }
  }

  test("q115 rule filter: keep flag is exactly 'no reason fired'") {
    val rows = q("q115_rule_filter").collect()
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.length === docs)
    rows.foreach { r =>
      val keep = r.getLong(2)
      val reasons = r.getString(3)
      assert((keep == 1L) === reasons.isEmpty,
        s"keep=$keep but reasons='$reasons' for doc ${r.getLong(0)}")
      // fixed emission order: any subset must appear in canonical order
      val canonical = Seq("too_short", "word_len", "no_stopword", "low_ttr")
      val emitted = reasons.split(",").filter(_.nonEmpty).toSeq
      assert(emitted === canonical.filter(emitted.contains))
    }
    // the rules discriminate on this corpus: some kept, some rejected
    assert(rows.exists(_.getLong(2) == 1L) && rows.exists(_.getLong(2) == 0L))
  }

  test("ruleFlags: NULL text fires too_short — keep=0 never pairs with empty reasons") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("the " + (1 to 40).map(i => s"word$i").mkString(" "))),
      (2L, None: Option[String]),
      (3L, Some(""))).toDF("doc_id", "text")
    val out = TextAnalysis.ruleFlags(docs)
      .select(col("doc_id"), col("keep"), col("reasons"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L)._1 === 1L && out(1L)._2.isEmpty)
    // the null-text row must carry an explanation, not a silent keep=0
    assert(out(2L)._1 === 0L && out(2L)._2.contains("too_short"))
    assert(out(3L)._1 === 0L && out(3L)._2.nonEmpty)
    out.values.foreach { case (keep, reasons) =>
      assert((keep == 1L) === reasons.isEmpty)
    }
  }

  test("q116 sliding chunks: stride-10 start positions, count matches formula") {
    val byDoc = q("q116_chunk_sliding").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val lens = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // exactly the docs with >=25 words are chunked
    assert(byDoc.keySet === lens.filter(_._2 >= 25).keySet)
    byDoc.foreach { case (doc, starts) =>
      val n = lens(doc)
      val expected = (1 to (n - 24) by 10).map(_.toLong)
      assert(starts.toSeq === expected, s"doc $doc (n=$n)")
    }
  }

  test("q117 buckets: full coverage, ordered ranges, all docs accounted for") {
    val rows = q("q117_quality_buckets").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.map(_._2).sum === docs)
    assert(rows.forall { case (_, n, lo, hi) => n > 0 && lo <= hi })
    // deciles partition the score axis: bucket k's min >= bucket k-1's max
    rows.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(lo2 >= hi1)
      case _ =>
    }
  }

  test("q118 temperature mix: weights sum to 1, dup_factor monotone in size") {
    val rows = q("q118_temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // τ = 0.7 < 1 flattens: smaller sources get strictly larger boost
    val bySize = rows.sortBy(_._2).toSeq
    bySize.sliding(2).foreach {
      case Seq((_, n1, _, d1), (_, n2, _, d2)) if n1 < n2 =>
        assert(d1 > d2, s"$n1→$d1, $n2→$d2")
      case _ =>
    }
  }

  test("q138 pipeline: keep ⟺ no drop reason ⟺ weight present; weights positive") {
    val rows = q("q138_curation_pipeline").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (id, keep, reason, weight) =>
      if (keep == 1L) {
        assert(reason.isEmpty && weight.exists(_ > 0.0),
          s"doc $id kept but reason='$reason' weight=$weight")
      } else {
        assert(reason.nonEmpty && weight.isEmpty,
          s"doc $id dropped but reason='$reason' weight=$weight")
        assert(reason == "duplicate" || reason.startsWith("rules:"),
          s"doc $id unknown reason '$reason'")
      }
    }
    // some of each decision class must exist on this corpus
    assert(rows.exists(_._2 == 1L) && rows.exists(_._3.startsWith("rules:")))
  }

  test("q140 weighted sample: selection skews toward heavier (longer) docs") {
    import org.apache.spark.sql.functions._
    val sample = q("q140_weighted_sample").collect()
    assert(sample.length == 30)
    val sampleMean = sample.map(_.getLong(1)).sum.toDouble / sample.length
    val corpusMean = graft.schema.Tables.t(spark, sf001, "documents")
      .select(avg(size(split(lower(trim(col("text"))), "\\s+"))))
      .head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
    // keys are valid: ln(u)/w is non-positive (exactly 0 iff a doc's
    // 56-bit md5 prefix is all-ones — a legitimate, if astronomically
    // rare, ES key) and sorted descending
    val keys = sample.map(_.getDouble(2))
    assert(keys.forall(_ <= 0.0) && keys.zip(keys.tail).forall { case (a, b) => a >= b })
  }

  test("q150 salted two-phase grouped top-k equals the plain one-window form") {
    import org.apache.spark.sql.expressions.Window
    // rebuild the scored frame exactly as q150 does, then take the top-5
    // per source with the NAIVE single window — the skew-trap plan the
    // salted composition must reproduce bit-identically (any doc in a
    // source's true top-5 is top-5 within its salt bucket)
    val scored = graft.schema.Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_words"),
        md5(col("text")).as("m"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("source"), col("n_words"),
        round(log((conv(substring(col("m"), 1, 14), 16, 10).cast("double") + lit(1.0))
            / lit(72057594037927936.0)) / col("n_words"), 6).as("es_key"))
    val plain = scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("es_key").desc, col("doc_id"))).cast("bigint"))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank"), col("doc_id"), col("n_words"), col("es_key"))
      .orderBy(col("source"), col("rank"))
      .collect()
    val salted = q("q150_group_weighted_sample").collect()
    assert(salted.toSeq === plain.toSeq)
    // every source with >=5 scored docs contributes exactly 5 ranks 1..5
    val bySource = salted.groupBy(_.getString(0))
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.length).toSeq,
        s"source $src ranks not contiguous")
    }
  }
}
