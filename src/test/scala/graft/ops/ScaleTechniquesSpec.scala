package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.schema.Tables

/** The two scale techniques SCALE.md promises beyond what AQE gives for
  * free: bucketed co-located joins (no exchange at all) and salted joins
  * for hot keys (same results, spread reducers). */
class ScaleTechniquesSpec extends SparkSpec {


  test("bucketed tables join without any Exchange") {
    val s = spark
    val li = Tables.t(s, sf001, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.t(s, sf001, "orders").select("o_orderkey", "o_totalprice")
    s.sql("DROP TABLE IF EXISTS li_bucketed")
    s.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    // force a sort-merge join: tiny test tables would broadcast, and the
    // planner disables bucketed scans for broadcast joins
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("li_bucketed")
        .join(s.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed q02 shape: join AND aggregate run on bucket partitioning, zero shuffles") {
    val s = spark
    // q02's real plan has exactly one unavoidable shuffle — orders⋈lineitem
    // on the natural key. Bucketing both facts by that key is the 100 TB
    // answer: the sort-merge join consumes the bucket partitioning, and the
    // groupBy(o_orderkey, …) is ALSO exchange-free because hash-partitioning
    // on o_orderkey already clusters every (o_orderkey, o_orderdate,
    // o_orderpriority) group. Only the deliberate customer broadcast remains.
    val cut = lit("1997-06-30 00:00:00").cast("timestamp") // q02's CUTOFF
    val o = Tables.t(s, sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.t(s, sf001, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    s.sql("DROP TABLE IF EXISTS o_q02_bucketed")
    s.sql("DROP TABLE IF EXISTS li_q02_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_q02_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_q02_bucketed")

    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val c = Tables.t(s, sf001, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val q02 = broadcast(c)
        .join(s.table("o_q02_bucketed").filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(s.table("li_q02_bucketed").filter(col("l_shipdate") > cut),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount")).cast("decimal(4,2)")).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
      val plan = q02.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed q02 still shuffles:\n$plan")
      assert(plan.contains("BroadcastExchange"), // the one intended exchange
        s"customer dim should broadcast:\n$plan")
      assert(plan.contains("TakeOrderedAndProject"), // top-k, no global sort
        s"ORDER BY+LIMIT should be TakeOrderedAndProject:\n$plan")
      // same rows as the unbucketed q02 at this SF
      val expected = graft.SparkEntry.queries("q02_topk_revenue")(s, sf001)
        .collect().toSeq
      assert(q02.collect().toSeq == expected)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed shingle layout: q42's overlap self-join goes exchange-free") {
    val s = spark
    // A 100 TB dedup deployment persists the (doc_id, h) shingle frame
    // between runs; bucketing it by the join key h makes the overlap
    // self-join — the family's one fact⋈fact exchange — consume the bucket
    // partitioning directly, mirroring the q02 proof. The only shuffle
    // left is the (doc_a, doc_b) pair aggregate, which is unavoidable and
    // |pairs|-sized, not |shingles|-sized.
    val sh = TextDedup.shingleRows(s, sf001).select(col("doc_id"), col("h1").as("h"))
    s.sql("DROP TABLE IF EXISTS sh_bucketed")
    sh.write.bucketBy(8, "h").sortBy("h").mode("overwrite").saveAsTable("sh_bucketed")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val b = s.table("sh_bucketed")
      val pairs = b.as("x").join(b.as("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning(h#"),
        s"overlap join still shuffles on the shingle hash:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"expected exactly the pair-aggregate exchange:\n$plan")
      // and the bucketed path computes the same candidate set
      assert(pairs.count() == TextDedup.overlapPairCount(s, sf001))
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("shingle doc-frequency cap drops only the quadratic hot keys") {
    val s = spark
    import s.implicits._
    // synthetic hot-shingle corpus: every doc shares one boilerplate
    // shingle (the quadratic key); each also has a rare one
    val hot = (1L to 20L).map(id => (id, "all rights reserved"))
    val rare = (1L to 20L).map(id => (id, s"unique shingle $id"))
    val rows = (hot ++ rare).toDF("doc_id", "sh")

    val capped = TextDedup.capDocFrequency(rows, maxDf = 5)
    val kept = capped.select("sh").distinct().as[String].collect().toSet
    assert(!kept.contains("all rights reserved"), "hot shingle must be dropped")
    assert(kept.size == 20, "every rare shingle must survive")

    // pair fan-out from the hot key is gone: the capped self-join
    // produces zero candidate pairs (rare shingles never collide),
    // against 20*19/2 = 190 from the uncapped hot key
    def pairs(df: org.apache.spark.sql.DataFrame) = df.as("x")
      .join(df.as("y"), col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .count()
    assert(pairs(rows) == 190L)
    assert(pairs(capped) == 0L)
  }

  test("doc-frequency cap conf gates the dedup family and stays off by default") {
    val s = spark
    assert(s.conf.getOption("graft.textdedup.maxShingleDf").isEmpty)
    val uncapped = graft.SparkEntry.queries("q42_ngram_jaccard")(s, sf001).count()
    try {
      s.conf.set("graft.textdedup.maxShingleDf", "2")
      val capped = graft.SparkEntry.queries("q42_ngram_jaccard")(s, sf001).count()
      // near-dup docs share most shingles, so a df-2 cap keeps true pairs
      // (their shared shingles have df == 2) — recall loss only on
      // boilerplate-driven pairs
      assert(capped <= uncapped)
    } finally s.conf.unset("graft.textdedup.maxShingleDf")
  }

  test("globalRowNumber matches the single-partition window, without one") {
    val s = spark
    val o = Tables.t(s, sf001, "orders").select("o_orderkey", "o_totalprice")
    val order = Seq(col("o_totalprice").desc, col("o_orderkey").asc) // total order
    val expected = o.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
        .cast("long"))
    val got = Skew.globalRowNumber(o, order, numPartitions = 8)
    assert(got.schema("rn").dataType == org.apache.spark.sql.types.LongType)
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty)
    assert(expected.exceptAll(got).isEmpty)
    // the point of the operator: no stage funnels all rows into one task
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"two-pass rank still has a single-partition exchange:\n$plan")
  }

  test("property: globalRowNumber matches the window on random data") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random values with deliberate duplicates (the range partitioner may
    // split equal keys across buckets — the tiebreaker must heal that) and
    // random partition counts incl. more partitions than rows
    val listGen = Gen.listOfN(60, Gen.choose(0, 9))
    (0 until 10).foreach { i =>
      val vals = listGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val nPart = 1 + i % 7
      val df = vals.zipWithIndex.map { case (v, idx) => (v, idx.toLong) }
        .toDF("v", "idx")
      val order = Seq(col("v").asc, col("idx").asc)
      val got = Skew.globalRowNumber(df, order, nPart)
        .select("v", "idx", "rn").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
      val expected = df.withColumn("rn", row_number()
          .over(org.apache.spark.sql.expressions.Window.orderBy(order: _*)).cast("long"))
        .select("v", "idx", "rn").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
      assert(got.toSeq == expected.toSeq, s"mismatch at case $i (nPart=$nPart)")
    }
    }

  test("property: grouped stitch matches the per-group window on skewed data") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val W = org.apache.spark.sql.expressions.Window
    // deliberately skewed group sizes (one dominant group, some smaller
    // than a bucket), a NULL group (windows treat NULL as a regular
    // partition — the stitch's offset join must be null-safe), and
    // partition counts from 1 to more-than-groups; idx is the unique
    // tiebreaker the contract requires
    val listGen = Gen.listOfN(80, Gen.frequency(
      6 -> Gen.const("a"), 3 -> Gen.const("b"), 1 -> Gen.oneOf("c", "d"),
      1 -> Gen.const(null: String)))
    (0 until 8).foreach { i =>
      val groups = listGen.pureApply(Gen.Parameters.default, Seed(11L + i))
      val nPart = 1 + i % 6
      val df = groups.zipWithIndex
        .map { case (g, idx) => (g, idx.toLong, (idx % 7 + 1).toLong) }
        .toDF("g", "idx", "v")
      val w = W.partitionBy($"g").orderBy($"idx")
      def dump(d: org.apache.spark.sql.DataFrame, c: String) =
        d.select("g", "idx", c).collect()
          .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getLong(1), r.getLong(2)))
          .sortBy(t => (t._1, t._2)).toSeq
      val expRn = dump(df.withColumn("rn", row_number().over(w).cast("long")), "rn")
      val expCum = dump(df.withColumn("cum",
        sum($"v").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))), "cum")
      val gotRn = dump(Skew.groupedRowNumber(df, Seq("g"), Seq($"idx"), nPart), "rn")
      val gotCum = dump(
        Skew.groupedRunningSum(df, Seq("g"), Seq($"idx"), $"v", nPart), "cum")
      assert(gotRn == expRn, s"row numbers diverge at case $i (nPart=$nPart)")
      assert(gotCum == expCum, s"running sums diverge at case $i (nPart=$nPart)")
    }
    }

  test("property: multi-value stitch matches two windows AND the single-value engine") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val W = org.apache.spark.sql.expressions.Window
    // two value columns carried through ONE stitch (q205/q206's shape);
    // duplicates in the key force tiebreaker healing across bucket edges
    val listGen = Gen.listOfN(70, Gen.choose(0, 11))
    (0 until 8).foreach { i =>
      val vals = listGen.pureApply(Gen.Parameters.default, Seed(23L + i))
      val nPart = 1 + i % 6
      val df = vals.zipWithIndex
        .map { case (v, idx) => (v, idx.toLong, (idx % 5 + 1).toLong, (idx % 3).toLong) }
        .toDF("v", "idx", "a", "b")
      val order = Seq($"v".asc, $"idx".asc)
      val w = W.orderBy(order: _*).rowsBetween(W.unboundedPreceding, W.currentRow)
      def dump(d: org.apache.spark.sql.DataFrame, cs: Seq[String]) =
        d.select("idx", cs: _*).collect()
          .map(r => (r.getLong(0), cs.indices.map(j => r.getLong(j + 1)).toList))
          .sortBy(_._1).toSeq
      val exp = dump(df
        .withColumn("ca", sum($"a").over(w))
        .withColumn("cb", sum($"b").over(w)), Seq("ca", "cb"))
      val got = dump(Skew.globalRunningSums(df, order,
        Seq($"a" -> "ca", $"b" -> "cb"), nPart), Seq("ca", "cb"))
      assert(got == exp, s"multi-sum diverges from windows at case $i (nPart=$nPart)")
      // and from the single-value engine run twice
      val one = dump(Skew.globalRunningSum(df, order, $"a", nPart, "ca"), Seq("ca"))
      assert(got.map { case (idx, l) => (idx, List(l.head)) } == one,
        s"multi-sum first column diverges from the single-value engine at case $i")
    }
  }

  test("two-level prefix: many-chunk stitch matches the window (P=400)") {
    val s = spark
    import s.implicits._
    // P=400 crosses the 256 hybrid cutover, so the CHUNKED offsets path
    // runs: chunk size 20, ~20 chunks over 2000 rows — the within-chunk
    // hash-equi prefix and the chunk-level triangular prefix both cross
    // many boundaries. Values are keyed so bucket edges split duplicate
    // keys (the tiebreaker heals).
    val df = (0 until 2000).map(i => ((i * 7919) % 800, i.toLong, (i % 5 + 1).toLong))
      .toDF("v", "idx", "w")
    val order = Seq(col("v").asc, col("idx").asc)
    val W = org.apache.spark.sql.expressions.Window
    val exp = df.withColumn("cum", sum($"w")
        .over(W.orderBy(order: _*).rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("rn", row_number().over(W.orderBy(order: _*)).cast("long"))
      .select("idx", "rn", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val gotRn = Skew.globalRowNumber(df, order, numPartitions = 400)
    val gotCum = Skew.globalRunningSum(df, order, $"w", numPartitions = 400)
    val got = gotRn.select("idx", "rn")
      .join(gotCum.select("idx", "cum"), Seq("idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == exp, "chunked two-level prefix diverges from the window")
    // and the grouped variant through the same chunked path
    val dfg = df.withColumn("g", ($"idx" % 3).cast("string"))
    val wg = W.partitionBy($"g").orderBy($"idx")
    val expG = dfg.withColumn("cum", sum($"w")
        .over(wg.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .select("idx", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val gotG = Skew.groupedRunningSum(dfg, Seq("g"), Seq($"idx"), $"w", 400)
      .select("idx", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(gotG == expG, "grouped chunked prefix diverges from the window")
  }

  test("stitch construction is lazy: no shuffle, no pinned blocks, bounded jobs") {
    val s = spark
    // Round-9 contract (VERDICT r8 tasks 1/5/7): the stitch's bucket ids
    // are literal sampled boundaries, so construction runs ONLY the
    // bounded boundary-sample jobs — no localCheckpoint of the data (zero
    // persisted blocks to lose on executor failure), no full-data shuffle
    // until the caller's first action, and explain() triggers nothing
    // beyond the sample.
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach(m =>
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten))
    }
    // build the input BEFORE the listener window: spark.read.parquet runs
    // its own schema/file-listing job, which is not the stitch's doing
    val docs = Tables.t(s, sf001, "documents").select(col("doc_id"), col("source"))
    s.sparkContext.addSparkListener(listener)
    try {
      val before = s.sparkContext.getRDDStorageInfo.length
      val stitched = Skew.groupedRowNumber(docs, Seq("source"), Seq(col("doc_id")), 8)
      stitched.queryExecution.executedPlan // force planning, like explain()
      Thread.sleep(500) // async listener bus drain
      assert(s.sparkContext.getRDDStorageInfo.length == before,
        "stitch construction pinned RDD blocks (localCheckpoint regression)")
      assert(jobs.get() <= 2,
        s"stitch construction ran ${jobs.get()} jobs — expected only the " +
          "boundary sample (+ its local sort)")
      assert(shuffleBytes.get() == 0L,
        s"stitch construction shuffled ${shuffleBytes.get()} bytes before any action")
      // and the result is still the per-group row number
      assert(stitched.filter(col("rn") === 1L).count() > 0)
    } finally s.sparkContext.removeSparkListener(listener)
  }

  test("partitioned layout: static partition pruning reaches the scan") {
    val s = spark
    // At 100 TB the fact table lives partitioned by a time column; a
    // literal predicate on that column must prune directories BEFORE any
    // file is opened (PartitionFilters in the scan node), not filter rows
    // after reading everything.
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val orders = Tables.t(s, sf001, "orders")
    orders.withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val q = s.read.parquet(dir).filter(col("o_year") === 1995)
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"partition filter did not reach the scan:\n$plan")
    val expected = orders.filter(year(col("o_orderdate")) === 1995).count()
    assert(q.collect().head.getLong(0) == expected)
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    val s = spark
    import s.implicits._
    // The star-schema case static pruning can't cover: the partition keys
    // to keep are only known after filtering the dimension. DPP inserts a
    // runtime subquery into the scan's PartitionFilters (reusing the
    // broadcast), so the fact side still never opens non-matching
    // partitions.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables.t(s, sf001, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val fact = s.read.parquet(dir)
    // the dim must be a real source: a local Seq folds its Filter into the
    // LocalRelation during optimization, and with no selective predicate
    // left on the build side the pruning rule never fires
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq((1995, "keep"), (1996, "drop")).toDF("d_year", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = s.read.parquet(dimDir)
    val q = fact.join(dim, col("o_year") === col("d_year"))
      .filter(col("tag") === "keep")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no runtime partition pruning in:\n$plan")
    val expected = Tables.t(s, sf001, "orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(q.collect().head.getLong(0) == expected)
  }

  test("salted join returns identical results to the plain join") {
    val s = spark
    val li = Tables.t(s, sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.t(s, sf001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "l_linenumber", 8)
    assert(salted.count() == plain.count())
    assert(salted.select(sum("l_quantity"), sum("o_totalprice")).collect().head ==
      plain.select(sum("l_quantity"), sum("o_totalprice")).collect().head)
    assert(salted.exceptAll(plain).isEmpty)
  }
}
