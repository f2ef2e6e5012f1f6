package graft

class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qk = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qk)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique across modules") {
    // derived from SparkEntry.allQs itself (the pre-toMap Seq) so a new
    // module can never drift out of this check: a duplicate would shadow
    // an entry in the queries Map silently
    val names = SparkEntry.allQs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("representative queries return rows at sf0.001") {
    val picks = Seq("q01_pricing_summary", "q10_local_supplier_volume",
      "q18_window_topk", "q36_session_window", "q41_minhash_lsh",
      "q44_cosine_topk", "q46_lang_id", "q50_multimodal_meta",
      "q91_sequence_packing", "q100_jaccard_capped", "q104_bigram_pmi",
      "q106_ann_multiprobe", "q108_dup_ngram_spans", "q110_kmeans_assign",
      // round-6 families: tokenizer application, eigen, graph, sketch,
      // event analytics, curation composition, quantized/weighted paths
      "q124_bpe_apply", "q125_power_iteration", "q127_knn_graph",
      "q128_pagerank", "q129_countmin", "q131_knn_components",
      "q135_window_funnel", "q138_curation_pipeline", "q139_quantized_ann",
      "q140_weighted_sample")
    picks.foreach { n =>
      assert(SparkEntry.queries(n)(spark, sf001).count() > 0, s"$n returned 0 rows")
    }
  }
}
