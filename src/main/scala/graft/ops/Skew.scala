package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftaccess.SortNodes
import org.apache.spark.sql.types._

/** Skew / scale mitigation for the shapes AQE does not cover (SCALE.md):
  * salted equi-joins for one-reducer-gets-the-world hash joins, and the
  * range-bucket + prefix-stitch engines that replace single-partition (or
  * low-cardinality-partition) windows for global/grouped row numbers and
  * running sums.
  *
  * Stitch engine design (round 9 — replaces the localCheckpoint pin):
  * range boundaries are sampled ONCE at construction and baked into the
  * plan as literals, so the bucket id is a PURE function of the row's key
  * values. Every consumer of the bucket column — the slice aggregate that
  * yields per-bucket offsets and the per-bucket window that yields local
  * prefix values — recomputes it identically, which removes the entire
  * class of resampling hazards the old design pinned against
  * (RangePartitioner seeds its reservoir with the per-job RDD id, so two
  * executions of the same `repartitionByRange` can disagree on bucket
  * assignment). No localCheckpoint, no persisted blocks, nothing to lose
  * on executor failure: a recomputed partition re-derives the same
  * buckets from the same rows.
  *
  * Cost shape per stitch: one bounded boundary-sampling job over the key
  * projection (reservoir per input partition, weighted quantile pick —
  * the same pass RangePartitioner itself would make), then lazily at
  * action time ONE full-data hash shuffle on (bucket, group) shared by
  * the window, plus a tiny map-side-combined slice aggregate whose
  * exclusive prefix (a window over ≤ numPartitions + |groups| − 1 rows)
  * broadcast-joins back. The old design paid two full-data exchanges plus
  * a checkpoint write and two checkpoint reads. */
object Skew {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      discriminator: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = left.withColumn("__salt", pmod(xxhash64(col(discriminator)), lit(buckets)))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Global row numbering without a single-partition window — the
    * 100×-scale answer to `Window.orderBy(...)` with no partition key
    * (which funnels every row through one task, q21's documented
    * dim-table-only caveat). `order` must be a total order (include a
    * unique tiebreaker), or ties split across bucket edges mis-rank.
    * Implemented as the grouped stitch with an empty group. */
  def globalRowNumber(
      df: DataFrame,
      order: Seq[Column],
      numPartitions: Int,
      outCol: String = "rn"): DataFrame =
    stitch(df, Seq.empty, order, numPartitions, sums = Seq.empty,
      rowNumCol = Some(outCol))

  /** Global running sum (ROWS UNBOUNDED PRECEDING … CURRENT ROW over the
    * whole frame) without a single-partition window — the weighted-rank
    * primitive behind exact weighted quantiles (q168). Same engine as
    * [[globalRowNumber]]; `value` must cast to LONG and `order` must be
    * total. */
  def globalRunningSum(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      numPartitions: Int,
      outCol: String = "cum",
      totalCol: Option[String] = None): DataFrame =
    stitch(df, Seq.empty, order, numPartitions, sums = Seq(value -> outCol),
      rowNumCol = None, sumTotals = totalCol.toSeq)

  /** Several running sums in ONE stitch: the ECDF/prefix consumers that
    * need two cumulative columns (q205's total+positive counts, q206's
    * total+label counts) would otherwise pay the boundary sample and the
    * (bucket, group) exchange twice — once per column — for prefixes over
    * the SAME ordering. Values must cast to LONG; `order` must be total. */
  def globalRunningSums(
      df: DataFrame,
      order: Seq[Column],
      values: Seq[(Column, String)],
      numPartitions: Int): DataFrame = {
    require(values.nonEmpty, "values must be non-empty")
    stitch(df, Seq.empty, order, numPartitions, sums = values,
      rowNumCol = None)
  }

  /** Per-group row numbering without `Window.partitionBy(group)` — with a
    * LOW-cardinality group key (a training corpus has ~20 sources), a
    * per-group window funnels each group's entire history through ONE
    * task; here parallelism scales with DATA size (bucket count), not
    * group count. `order` must be a total order within each group. */
  def groupedRowNumber(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      numPartitions: Int,
      outCol: String = "rn"): DataFrame = {
    require(group.nonEmpty, "group must be non-empty (use globalRowNumber)")
    stitch(df, group, order, numPartitions, sums = Seq.empty,
      rowNumCol = Some(outCol))
  }

  /** Running sum of `value` within each group (ROWS UNBOUNDED PRECEDING …
    * CURRENT ROW), stitched across range buckets — see [[groupedRowNumber]].
    * `value` must cast to LONG. `totalCol` additionally emits the
    * per-GROUP grand total off the slice frame (no extra full-data scan —
    * the consumer that needs rank AND group size, e.g. q317's tercile cut,
    * gets both from ONE stitch instead of a second aggregate pass). */
  def groupedRunningSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      value: Column,
      numPartitions: Int,
      outCol: String = "cum",
      totalCol: Option[String] = None): DataFrame = {
    require(group.nonEmpty, "group must be non-empty (use globalRowNumber)")
    stitch(df, group, order, numPartitions, sums = Seq(value -> outCol),
      rowNumCol = None, sumTotals = totalCol.toSeq)
  }

  private case class SortKey(c: Column, desc: Boolean, nullsFirst: Boolean) {
    /** The matching sort Column, for ordering the boundary sample the way
      * the caller's order would. */
    def sortCol(over: Column): Column = (desc, nullsFirst) match {
      case (false, true)  => over.asc_nulls_first
      case (false, false) => over.asc_nulls_last
      case (true, true)   => over.desc_nulls_first
      case (true, false)  => over.desc_nulls_last
    }
  }

  /** One unified stitch: 1) sample explicit range boundaries over
    * (group ++ order); 2) bucket = literal binary-search expression —
    * deterministic per row; 3) per-(bucket, group) slice totals, whose
    * per-group exclusive prefix over buckets is each slice's offset
    * (computed lazily as a window over the tiny slice frame — never a
    * driver collect); 4) local window per (bucket, group) + broadcast
    * offset join. Everything after the boundary sample is LAZY: explain()
    * on the result triggers no full-data job (PlanShapeSpec holds this). */
  private def stitch(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      numPartitions: Int,
      sums: Seq[(Column, String)],
      rowNumCol: Option[String],
      sumTotals: Seq[String] = Seq.empty): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(sumTotals.isEmpty || sumTotals.length == sums.length,
      "sumTotals must be empty or name one total per running sum")
    val si = sums.indices
    val reserved = Seq("__bucket", "__chunk", "__rn_off", "__off_bucket") ++
      si.flatMap(i => Seq(s"__val_$i", s"__sum_off_$i")) ++
      group.map(g => s"__off_$g")
    require(!df.columns.exists(reserved.contains),
      s"input must not carry the stitch's working columns ${reserved.mkString(", ")}")
    val groupCols = group.map(col)
    // bucket keys: group first (each group occupies a contiguous bucket
    // range), then the caller's order with its directions
    val keys = group.map(g => SortKey(col(g), desc = false, nullsFirst = true)) ++
      order.map { c => val (ch, d, nf) = SortNodes.parse(c); SortKey(ch, d, nf) }
    val keyTypes = df.select(keys.map(_.c): _*).schema.map(_.dataType)
    keyTypes.foreach { dt =>
      val atomic = dt match {
        case _: NumericType | _: StringType => true
        case BooleanType | DateType | TimestampType | TimestampNTZType | BinaryType => true
        case _ => false
      }
      require(atomic,
        s"stitch keys must be atomic (orderable + literal-encodable) types, got $dt")
    }
    val bounds = sampleBoundaries(df, keys, numPartitions)
    val withB = sums.zipWithIndex.foldLeft(df) { case (acc, ((v, _), i)) =>
        acc.withColumn(s"__val_$i", v.cast("long"))
      }
      .withColumn("__bucket", bucketExpr(keys, bounds, keyTypes))
    // per-(bucket, group) totals: a map-side-combined aggregate of ≤
    // (|bounds|+1) + |groups| − 1 rows (groups are bucket-contiguous)
    val sliceAggs = count(lit(1)).as("__cnt") +:
      si.map(i => coalesce(sum(col(s"__val_$i")), lit(0L)).as(s"__sum_$i"))
    val slices = withB
      .groupBy(col("__bucket") +: groupCols: _*) // groupBy keeps NULL groups
      .agg(sliceAggs.head, sliceAggs.tail: _*)
    // exclusive prefix per group over buckets, WITHOUT a window: a
    // per-group window here would be 1-ary-partitioned (the exact
    // low-cardinality shape the engine exists to kill — even if only over
    // the tiny slice frame, it would make every consumer's plan fail the
    // "no window keyed on the bare source column" audit), and the global
    // case would need an unpartitioned window (a SinglePartition
    // exchange). Instead: broadcast self-joins + hash aggregates — earlier
    // buckets' totals sum into each bucket's offset. The prefix is
    // HYBRID on P (VERDICT r9 item 2):
    //  - P ≤ 256: one flat triangular self-join — O(P²) ≤ 65k compares,
    //    trivial, and 3 fewer tiny broadcast stages than the chunked
    //    path (each costs real scheduling latency at local scale:
    //    measured +0.5–2 task-s per stitch on the sf0.1 bench).
    //  - P > 256: two-level chunked prefix. A flat join at a cluster's
    //    P≈10⁵ compares 10¹⁰ pairs inside a broadcast NLJ; chunking
    //    buckets into √P-sized runs gives (a) a within-chunk prefix
    //    whose join carries an EQUI key on the chunk id — Catalyst plans
    //    a broadcast HASH join, so only the ≤√P same-chunk prior slices
    //    materialize per row: O(P·√P) — and (b) a flat triangular prefix
    //    over the ≤√P chunk totals: O(P). Total O(P^1.5) — at P=10⁵,
    //    ~3×10⁷ compares instead of 10¹⁰.
    // Offsets keep the group columns under aliased names so all joins
    // can be NULL-SAFE on them: Window.partitionBy treats NULL as a
    // regular partition, and a plain equi-join would silently drop those
    // rows.
    //
    // flatPrefix: exclusive prefix of (cnt, sums) over `ord` within each
    // group, via one broadcast triangular join — O(|frame|²) compares.
    // cnt/sumCols name the input measure columns; outputs are
    // (ord, group..., outRn, outSums...).
    def flatPrefix(
        frame: DataFrame, ord: String, cnt: String, sumCols: Seq[String],
        outRn: String, outSums: Seq[String]): DataFrame = {
      val pr = frame.select(
        (col(ord).as("__pb") +:
          group.map(g => col(g).as(s"__pg_$g")) :+
          col(cnt).as("__pc")) ++
          sumCols.zipWithIndex.map { case (c, i) => col(c).as(s"__ps_$i") }: _*)
      val cond = group.map(g => col(g) <=> col(s"__pg_$g"))
        .foldLeft(col("__pb") < col(ord))(_ && _)
      val aggs = coalesce(sum(col("__pc")), lit(0L)).as(outRn) +:
        si.map(i => coalesce(sum(col(s"__ps_$i")), lit(0L)).as(outSums(i)))
      frame.join(broadcast(pr), cond, "left")
        .groupBy(col(ord) +: groupCols: _*)
        .agg(aggs.head, aggs.tail: _*)
    }
    val sumNames = si.map(i => s"__sum_$i")
    val offsets0 =
      if (numPartitions <= 256) {
        flatPrefix(slices, "__bucket", "__cnt", sumNames,
          "__rn_off", si.map(i => s"__sum_off_$i"))
      } else {
        val chunkSize = math.max(1L, math.round(math.sqrt(numPartitions.toDouble)))
        val sl = slices.withColumn("__chunk", expr(s"__bucket div $chunkSize"))
        // (a) within-chunk exclusive prefix — equi on chunk, < on bucket
        val prior = sl.select(
          (col("__chunk").as("__pch") +:
            col("__bucket").as("__pb") +:
            group.map(g => col(g).as(s"__pg_$g")) :+
            col("__cnt").as("__pc")) ++
            si.map(i => col(s"__sum_$i").as(s"__ps_$i")): _*)
        val withinCond = (group.map(g => col(g) <=> col(s"__pg_$g")) :+
          (col("__pb") < col("__bucket")))
          .foldLeft(col("__chunk") === col("__pch"))(_ && _)
        val withinAggs = coalesce(sum(col("__pc")), lit(0L)).as("__w_rn") +:
          si.map(i => coalesce(sum(col(s"__ps_$i")), lit(0L)).as(s"__w_s_$i"))
        val within = sl
          .join(broadcast(prior), withinCond, "left")
          .groupBy(col("__bucket") +: col("__chunk") +: groupCols: _*)
          .agg(withinAggs.head, withinAggs.tail: _*)
        // (b) chunk totals and THEIR flat exclusive prefix (≤√P rows)
        val cAggs = sum(col("__cnt")).as("__ccnt") +:
          si.map(i => sum(col(s"__sum_$i")).as(s"__cs_$i"))
        val chunkTotals = sl.groupBy(col("__chunk") +: groupCols: _*)
          .agg(cAggs.head, cAggs.tail: _*)
        val chunkOff = flatPrefix(chunkTotals, "__chunk", "__ccnt",
          si.map(i => s"__cs_$i"), "__c_rn", si.map(i => s"__c_s_$i"))
          .select(
            (col("__chunk").as("__co_chunk") +:
              group.map(g => col(g).as(s"__cog_$g")) :+
              col("__c_rn")) ++
              si.map(i => col(s"__c_s_$i")): _*)
        // offset(bucket) = earlier-chunks total + earlier-buckets-in-chunk
        // total; inner join is safe — within's (chunk, group) keys are a
        // subset of chunkTotals' by construction
        val coCond = group.map(g => col(g) <=> col(s"__cog_$g"))
          .foldLeft(col("__chunk") === col("__co_chunk"))(_ && _)
        within
          .join(broadcast(chunkOff), coCond)
          .select(
            (col("__bucket") +:
              groupCols :+
              (col("__w_rn") + col("__c_rn")).as("__rn_off")) ++
              si.map(i => (col(s"__w_s_$i") + col(s"__c_s_$i")).as(s"__sum_off_$i")): _*)
      }
    val offsets = offsets0.select(
      (col("__bucket").as("__off_bucket") +:
        group.map(g => col(g).as(s"__off_$g")) :+
        col("__rn_off")) ++
        si.map(i => col(s"__sum_off_$i")): _*)
    val joinCond = ((col("__bucket") === col("__off_bucket")) +:
      group.map(g => col(g) <=> col(s"__off_$g"))).reduce(_ && _)
    val w = Window
      .partitionBy(col("__bucket") +: groupCols: _*).orderBy(order: _*)
    var res = withB.join(broadcast(offsets), joinCond)
      .drop("__off_bucket" +: group.map(g => s"__off_$g"): _*)
    rowNumCol.foreach { c =>
      res = res.withColumn(c, row_number().over(w) + col("__rn_off"))
    }
    sums.zipWithIndex.foreach { case ((_, outCol), i) =>
      res = res.withColumn(outCol,
        sum(col(s"__val_$i")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          col(s"__sum_off_$i"))
    }
    // whole-frame totals ride the SLICE frame (Σ over its per-bucket
    // sums), so a consumer that needs `cum` AND the grand total (exact
    // weighted quantiles: cum·k ≥ d·W) pays no extra full-data scan —
    // the slice subtree is already in the plan and its exchange is
    // reused. Global case: a broadcast 1-row cross join; grouped case:
    // a null-safe broadcast join on the group key.
    if (sumTotals.nonEmpty) {
      val tAggs = si.map(i =>
        coalesce(sum(col(s"__sum_$i")), lit(0L)).as(sumTotals(i)))
      if (group.isEmpty) {
        val totals = slices.agg(tAggs.head, tAggs.tail: _*)
        res = res.crossJoin(broadcast(totals))
      } else {
        val totals = slices.groupBy(groupCols: _*)
          .agg(tAggs.head, tAggs.tail: _*)
          .select(group.map(g => col(g).as(s"__tg_$g")) ++
            sumTotals.map(col): _*)
        val tCond = group.map(g => col(g) <=> col(s"__tg_$g")).reduce(_ && _)
        res = res.join(broadcast(totals), tCond)
          .drop(group.map(g => s"__tg_$g"): _*)
      }
    }
    res.drop(Seq("__bucket", "__rn_off") ++
      si.flatMap(i => Seq(s"__sum_off_$i", s"__val_$i")): _*)
  }

  /** Sampled boundary key tuples, ascending in the key order — the same
    * weighted-reservoir pass RangePartitioner makes, but run ONCE with the
    * result held as plain values so every consumer of the plan agrees on
    * bucket edges. Reservoirs are seeded by partition index
    * (deterministic for a fixed input partitioning; across runs the
    * boundaries may shift, which only moves load, never results). The
    * sample is sorted by SPARK in a tiny local frame, so boundary order
    * follows engine sort semantics exactly (no hand-rolled driver
    * comparators to drift). */
  private def sampleBoundaries(
      df: DataFrame,
      keys: Seq[SortKey],
      numPartitions: Int): Seq[Seq[Any]] = {
    if (numPartitions <= 1) return Seq.empty
    val spark = df.sparkSession
    val keyed = df.select(keys.zipWithIndex.map { case (k, i) => k.c.as(s"__k$i") }: _*)
    val perPart = 200
    // Sample over INTERNAL rows (OPTIMIZATION_r16): `.rdd` deserialized
    // the whole corpus to external Row objects just to keep ≤200 per
    // partition — the guide's §1.4 warning, paid once per stitch. toRdd
    // runs the same codegen'd plan and only the kept rows are copied;
    // the reservoir sequence (seed, traversal order) is unchanged, so the
    // boundaries — and therefore every bucket literal downstream — are
    // identical. Conversion to external values happens on the driver,
    // over ≤200·|parts| rows.
    val keyedSchema = keyed.schema
    val samplesRaw = keyed.queryExecution.toRdd.mapPartitionsWithIndex { (idx, it) =>
      val rng = new java.util.Random(0x9E3779B97F4A7C15L ^ idx.toLong)
      val res = new Array[org.apache.spark.sql.catalyst.InternalRow](perPart)
      var n = 0L
      while (it.hasNext) {
        val r = it.next()
        if (n < perPart) res(n.toInt) = r.copy()
        else {
          val j = (rng.nextDouble() * (n + 1)).toLong
          if (j < perPart) res(j.toInt) = r.copy()
        }
        n += 1
      }
      Iterator.single((n, res.take(math.min(n, perPart.toLong).toInt)))
    }.collect()
    val toScala = keyedSchema.fields.map(f =>
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(f.dataType))
    val samples = samplesRaw.map { case (n, irs) =>
      (n, irs.map { ir =>
        Row.fromSeq(keyedSchema.fields.indices.map(i =>
          toScala(i)(ir.get(i, keyedSchema.fields(i).dataType))))
      })
    }
    val total = samples.map(_._1).sum
    if (total == 0L) return Seq.empty
    // weight each sampled row by rowsInPartition / samplesFromPartition so
    // unevenly sized input partitions don't skew the quantiles
    val weighted = samples.toSeq.flatMap { case (n, rs) =>
      if (rs.isEmpty) Seq.empty[Row]
      else {
        val w = n.toDouble / rs.length
        rs.toSeq.map(r => Row.fromSeq(r.toSeq :+ w))
      }
    }
    val schema = StructType(keyed.schema.fields :+ StructField("__w", DoubleType))
    import scala.jdk.CollectionConverters._
    // coalesce(1) + sortWithinPartitions: one task, no range exchange (a
    // plain orderBy would launch a 2-stage sampled sort for a few hundred
    // local rows); collect preserves within-partition order
    val sorted = spark.createDataFrame(weighted.asJava, schema)
      .coalesce(1)
      .sortWithinPartitions(
        keys.zipWithIndex.map { case (k, i) => k.sortCol(col(s"__k$i")) }: _*)
      .collect()
    val totW = weighted.map(_.getDouble(keys.size)).sum
    val step = totW / numPartitions
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    var cum = 0.0
    var target = step
    sorted.foreach { r =>
      cum += r.getDouble(keys.size)
      if (cum >= target && bounds.size < numPartitions - 1) {
        val key = r.toSeq.dropRight(1)
        if (!bounds.lastOption.contains(key)) bounds += key
        target += step
      }
    }
    bounds.toSeq
  }

  /** bucket id ∈ [0, |bounds|] as a literal binary-search expression:
    * O(log P · |keys|) comparisons per row (a linear boundary chain would
    * pay O(P) per row — real money at cluster-scale partition counts).
    * Rows equal to a boundary land in the bucket at and after it, so
    * bucket i holds keys in [bounds(i−1), bounds(i)). */
  private def bucketExpr(
      keys: Seq[SortKey],
      bounds: Seq[Seq[Any]],
      keyTypes: Seq[DataType]): Column = {
    if (bounds.isEmpty) return lit(0L)
    def search(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi + 1) / 2 // boundary mid-1 splits [lo, mid-1] / [mid, hi]
        when(rowLtBoundary(keys, bounds(mid - 1), keyTypes),
          search(lo, mid - 1)).otherwise(search(mid, hi))
      }
    search(0, bounds.size)
  }

  /** Row strictly-before the boundary tuple under the lexicographic key
    * order (per-key direction + null ordering respected). */
  private def rowLtBoundary(
      keys: Seq[SortKey],
      bound: Seq[Any],
      keyTypes: Seq[DataType]): Column =
    keys.indices.reverse.foldLeft(lit(false)) { (tailLt, i) =>
      keyLt(keys(i), bound(i), keyTypes(i)) ||
        ((keys(i).c <=> boundLit(bound(i), keyTypes(i))) && tailLt)
    }

  private def boundLit(v: Any, dt: DataType): Column =
    if (v == null) lit(null).cast(dt) else lit(v).cast(dt)

  /** Key strictly sorts before the boundary value, under the key's
    * direction and null ordering. Null boundary: with nulls first nothing
    * sorts before null; with nulls last every non-null does. Non-null
    * boundary: a null key sorts before iff nulls come first; otherwise
    * the plain comparison (null-guarded to false). */
  private def keyLt(k: SortKey, v: Any, dt: DataType): Column =
    if (v == null) {
      if (k.nullsFirst) lit(false) else k.c.isNotNull
    } else {
      val cmp = if (k.desc) k.c > boundLit(v, dt) else k.c < boundLit(v, dt)
      if (k.nullsFirst) k.c.isNull || cmp else coalesce(cmp, lit(false))
    }
}
