package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Skew mitigation for heavy-key equi-joins (SCALE.md): AQE's skew-join
  * splitting covers sort-merge joins automatically, but when one key
  * dominates a shuffled hash join (one reducer gets the world), salting
  * spreads the hot key across `buckets` reducers deterministically.
  *
  * Left rows get a salt derived from a high-cardinality discriminator
  * column (any unique-ish column works — order key, line number, doc id);
  * the right side is replicated once per salt value. The join key becomes
  * (key, salt), so a key carrying N rows lands on up to `buckets` reducers
  * instead of one. */
object Skew {

  /** Pin the stitch engines' range-parted frame across their two passes:
    * localCheckpoint — rows stored as-is, pass 2/3 literally reread pass
    * 1's blocks (on a cluster swap for reliable `checkpoint`; blocks
    * release via the ContextCleaner once the result is unreferenced).
    *
    * This is deliberately the ONLY mode. Alternatives were measured and
    * rejected in the round-8 review (SCALE.md): skipping the pin is
    * unsound because an unpinned rerun of `repartitionByRange` is NOT
    * guaranteed to reproduce bucket assignment — RangePartitioner seeds
    * its reservoir sampling with the RDD id (`byteswap32(idx ^ (rdd.id
    * << 16))`), a fresh counter per job, so pass 2's offsets and pass
    * 3's buckets could disagree on any input large enough to actually
    * sample; and a `persist()` pin is the same unsoundness one LRU
    * eviction later (an evicted InMemoryRelation block recomputes —
    * and resamples — the exchange), for no measured gain (44.1 vs 43.8
    * task-s on q75 at sf0.1). */
  private[ops] def pinned(df: DataFrame): DataFrame = df.localCheckpoint()

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
    * dim-table-only caveat).
    *
    * Two-pass range-bucket + stitch:
    *   1. range-repartition by the total order, so partition i holds keys
    *      strictly before partition i+1's;
    *   2. one tiny aggregation (numPartitions rows) gives each bucket's
    *      size, whose exclusive prefix sum is the bucket's global offset;
    *   3. a window partitioned by bucket id computes local row numbers in
    *      parallel; global = local + offset via a broadcast join.
    *
    * The order must be total (include a tiebreaker column): range
    * boundaries may split equal keys across adjacent partitions, which is
    * fine for row_number but would mis-rank ties. The range-parted frame
    * is localCheckpointed so pass 2 and pass 3 see the same (sampled)
    * boundaries; on a cluster use `checkpoint` or persist-replicated. */
  def globalRowNumber(
      df: DataFrame,
      order: Seq[org.apache.spark.sql.Column],
      numPartitions: Int,
      outCol: String = "rn"): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    val parted = pinned(df.repartitionByRange(numPartitions, order: _*)
      .withColumn("__bucket", spark_partition_id()))
    val offsets = {
      val sizes = parted.groupBy(col("__bucket")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq.sortBy(_._1)
      val running = sizes.scanLeft(0L)(_ + _._2)
      sizes.map(_._1).zip(running) // bucket -> rows before it
    }
    val offsetDf = df.sparkSession
      .createDataFrame(offsets).toDF("__bucket", "__offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket")).orderBy(order: _*)
    parted
      .join(broadcast(offsetDf), Seq("__bucket"))
      .withColumn(outCol, row_number().over(w) + col("__offset"))
      .drop("__bucket", "__offset")
  }

  /** Grouped prefix computations — row number and/or running sum within a
    * group, ordered by a total order — without `Window.partitionBy(group)`.
    *
    * With a LOW-cardinality group key (a training corpus has ~20 sources),
    * a per-group window funnels each group's entire history through ONE
    * task: at 100 TB that is a 20-partition bottleneck no matter how many
    * executors exist. Same two-pass range-bucket + stitch as
    * [[globalRowNumber]], generalized per group:
    *
    *   1. range-repartition by (group ++ order): each group occupies a
    *      contiguous run of buckets, each bucket bounded by partition size
    *      — parallelism scales with DATA size, not group count;
    *   2. one tiny per-(bucket, group) aggregate (≤ numPartitions +
    *      |groups| − 1 rows, by contiguity of the ranges) collected to the
    *      driver; its per-group exclusive prefix over buckets is each
    *      slice's starting row number / running-sum offset;
    *   3. a window partitioned by (bucket, group) computes LOCAL prefix
    *      values in parallel; global = local + broadcast offset.
    *
    * `order` must be a total order within each group (include a unique
    * tiebreaker): range boundaries may split equal keys across adjacent
    * buckets, which would otherwise mis-stitch ties. The range-parted
    * frame is localCheckpointed so passes 2 and 3 see the same (sampled)
    * boundaries.
    *
    * EAGER: unlike a plain DataFrame transformation, building the result
    * runs real Spark jobs (the localCheckpoint of pass 1 and the driver
    * collect of pass 2) before the caller ever triggers an action — so a
    * plan-only consumer (EXPLAIN tooling, PlanShapeSpec) pays the
    * repartition + slice-aggregate cost, and the checkpointed blocks stay
    * pinned until the returned frame is unreferenced. This is inherent to
    * the two-pass design (pass 3's plan depends on pass 2's data). */
  def groupedRowNumber(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      numPartitions: Int,
      outCol: String = "rn"): DataFrame =
    groupedStitch(df, group, order, numPartitions, value = None,
      rowNumCol = Some(outCol), sumCol = None)

  /** Running sum of `value` within each group (ROWS UNBOUNDED PRECEDING …
    * CURRENT ROW), stitched across range buckets — see [[groupedRowNumber]]
    * for the why, the mechanics, and the EAGER-construction caveat.
    * `value` must cast to LONG. */
  def groupedRunningSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      value: Column,
      numPartitions: Int,
      outCol: String = "cum"): DataFrame =
    groupedStitch(df, group, order, numPartitions, value = Some(value),
      rowNumCol = None, sumCol = Some(outCol))

  private def groupedStitch(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      numPartitions: Int,
      value: Option[Column],
      rowNumCol: Option[String],
      sumCol: Option[String]): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(group.nonEmpty, "group must be non-empty (use globalRowNumber)")
    val reserved = Seq("__val", "__bucket", "__rn_off", "__sum_off",
      "__off_bucket") ++ group.map(g => s"__off_$g")
    require(!df.columns.exists(reserved.contains),
      s"input must not carry the stitch's working columns ${reserved.mkString(", ")}")
    val groupCols = group.map(col)
    // localCheckpoint blocks are not CacheRegistry-managed: they are
    // released by the ContextCleaner once the returned frame is
    // unreferenced (same lifecycle as clusterPairs' per-round checkpoints)
    val parted = df
      .withColumn("__val", value.getOrElse(lit(1L)).cast("long"))
      .repartitionByRange(numPartitions, groupCols ++ order: _*)
      .transform(p => pinned(p.withColumn("__bucket", spark_partition_id())))
    val nG = group.size
    // per-(bucket, group) totals: bounded by numPartitions + |groups| − 1
    // rows (each group's buckets are a contiguous range), so the collect
    // is a few KB even with thousands of buckets
    val slices = parted
      .groupBy(col("__bucket") +: groupCols: _*) // groupBy keeps NULL groups
      .agg(count(lit(1)).as("__cnt"), coalesce(sum(col("__val")), lit(0L)).as("__sum"))
      .collect()
    val offsetRows: Seq[Row] = slices
      .groupBy(r => (1 to nG).map(r.get): Seq[Any])
      .valuesIterator.flatMap { rs =>
        var cnt = 0L
        var sm = 0L
        rs.sortBy(_.getInt(0)).map { r =>
          val out = Row.fromSeq(r.toSeq.dropRight(2) ++ Seq(cnt, sm))
          cnt += r.getLong(nG + 1)
          sm += r.getLong(nG + 2)
          out
        }
      }.toSeq
    // offset frame keeps the group columns under aliased names so the join
    // can be NULL-SAFE on them: Window.partitionBy treats NULL as a regular
    // partition, and a plain equi-join would silently drop those rows
    val offSchema = StructType(
      StructField("__off_bucket", org.apache.spark.sql.types.IntegerType) +:
        group.map(g => parted.schema(g).copy(name = s"__off_$g")) :+
        StructField("__rn_off", LongType) :+ StructField("__sum_off", LongType))
    import scala.jdk.CollectionConverters._
    val offsetDf = df.sparkSession.createDataFrame(offsetRows.asJava, offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket") +: groupCols: _*).orderBy(order: _*)
    val joinCond = (col("__bucket") === col("__off_bucket")) +:
      group.map(g => col(g) <=> col(s"__off_$g"))
    var res = parted.join(broadcast(offsetDf), joinCond.reduce(_ && _))
      .drop("__off_bucket" +: group.map(g => s"__off_$g"): _*)
    rowNumCol.foreach { c =>
      res = res.withColumn(c, row_number().over(w) + col("__rn_off"))
    }
    sumCol.foreach { c =>
      res = res.withColumn(c,
        sum(col("__val")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)) + col("__sum_off"))
    }
    res.drop("__bucket", "__rn_off", "__sum_off", "__val")
  }
}
