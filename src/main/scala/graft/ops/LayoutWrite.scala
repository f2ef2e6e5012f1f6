package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The WRITE half of the layout family: q327/q329 audit the envelope
  * tightness a curve layout WOULD hand the scan pruner; this module
  * actually writes the table in each layout and reads the real parquet
  * footers back, so the pruning payoff is measured against physical
  * row-group statistics instead of predicted from the audit frame
  * (VERDICT r15 next-round item 2). The reference appends batches in
  * arrival order with no layout notion (`/root/reference/internal/
  * collector/collector.go:119-155`); ClickHouse's ORDER BY key +
  * minmax skip indexes are the analogous production machinery.
  *
  * Scale shape of the write path: ONE bounds aggregate (1-row
  * broadcast), a pure-arithmetic curve projection, and ONE
  * `repartitionByRange` exchange on the curve key — the range
  * partitioner samples rather than sorts globally, and
  * `sortWithinPartitions` is a per-partition sort, so nothing here is
  * a global sort even at 100 TB. Footer reading is driver-side but
  * bounded by the FILE count (a catalog-sized artifact, never rows).
  */
object LayoutWrite {

  /** The 1-row lane-bounds frame derived from the data itself (the q327
    * audit posture — a full rewrite re-derives bounds every time). */
  def derivedBounds(o: DataFrame): DataFrame =
    o.agg(min(col("ck")).as("ck_lo"), max(col("ck")).as("ck_hi"),
      min(col("od")).as("od_lo"), max(col("od")).as("od_hi"))

  /** PINNED lane bounds — the incremental-maintenance posture: a live
    * table's curve bounds are fixed at creation so arriving partitions
    * bucket consistently without re-keying history. Rows outside the
    * pinned domain land in out-of-range buckets, which is exactly what
    * the drift monitor watches (StreamingLayoutSpec). */
  def pinnedBounds(spark: SparkSession, ckLo: Long, ckHi: Long,
      odLo: String, odHi: String): DataFrame =
    spark.range(1).select(lit(ckLo).as("ck_lo"), lit(ckHi).as("ck_hi"),
      to_date(lit(odLo)).as("od_lo"), to_date(lit(odHi)).as("od_hi"))

  /** (ck, od) → (ck, od, z): the q327 Morton key over the frame's own
    * bounds — identical lane + interleave text as the audit query. */
  def zFrame(o: DataFrame): DataFrame = zFrame(o, derivedBounds(o))

  /** [[zFrame]] against an explicit 1-row bounds frame. */
  def zFrame(o: DataFrame, bounds: DataFrame): DataFrame = {
    o.crossJoin(broadcast(bounds))
      .withColumn("xi", expr(LayoutOps.laneSpark("ck", "ck_lo", "ck_hi")))
      .withColumn("yi", expr(LayoutOps.laneSpark("CAST(datediff(od, od_lo) AS BIGINT)",
        "0", "CAST(datediff(od_hi, od_lo) AS BIGINT)")))
      .withColumn("z", expr(LayoutOps.zExpr("xi", "yi")))
      .select(col("ck"), col("od"), col("z"))
  }

  /** (ck, od) → (ck, od, d): the q329 Hilbert key — the same 16-step
    * reflect-and-swap walk as the audit query. */
  def hilbertFrame(o: DataFrame): DataFrame = hilbertFrame(o, derivedBounds(o))

  /** [[hilbertFrame]] against an explicit 1-row bounds frame. */
  def hilbertFrame(o: DataFrame, bounds: DataFrame): DataFrame = {
    var df = o.crossJoin(broadcast(bounds))
      .select(col("ck"), col("od"),
        expr(LayoutOps.laneSpark("ck", "ck_lo", "ck_hi")).as("x"),
        expr(LayoutOps.laneSpark("CAST(datediff(od, od_lo) AS BIGINT)",
          "0", "CAST(datediff(od_hi, od_lo) AS BIGINT)")).as("y"),
        lit(0L).as("d"))
    LayoutOps.HilbertSides.foreach { side =>
      val (xN, yN, dN) = LayoutOps.hilbertStep(side, "x", "y", "d",
        (a, b) => s"($a ^ $b)")
      df = df.select(col("ck"), col("od"),
        expr(xN).as("x"), expr(yN).as("y"), expr(dN).as("d"))
    }
    df.select(col("ck"), col("od"), col("d"))
  }

  /** Write a (ck, od) frame to `path` in one of the four layouts under
    * comparison. `files` bounds the output file count (the range
    * partitioner's target); the curve layouts order rows by their curve
    * key so every file footer carries a tight min/max on BOTH columns. */
  def writeLayout(o: DataFrame, layout: String, path: String, files: Int): Unit = {
    val out = layout match {
      case "hash"    => o.repartition(files, col("ck"))
      case "sort_ck" => o.repartitionByRange(files, col("ck"))
        .sortWithinPartitions(col("ck"))
      case "zorder"  => zFrame(o).repartitionByRange(files, col("z"))
        .sortWithinPartitions(col("z")).drop("z")
      case "hilbert" => hilbertFrame(o).repartitionByRange(files, col("d"))
        .sortWithinPartitions(col("d")).drop("d")
      case other => throw new IllegalArgumentException(s"unknown layout $other")
    }
    out.write.mode("overwrite").parquet(path)
  }

  /** The q327/q329-shaped per-bucket envelope report over a keyed frame:
    * bucket = keyCol >> 26 (64 equal-width cells of the 32-bit curve
    * range), per-bucket row count and per-dimension min/max. NOTE: the
    * 16-term interleave reads only the low 16 lane bits, so rows beyond
    * PINNED bounds alias into in-domain buckets — domain drift is
    * detected from the envelope min/max against the pinned bounds
    * (StreamingLayoutSpec), never from the bucket id. */
  def envelopes(keyed: DataFrame, keyCol: String): DataFrame =
    keyed.groupBy(expr(s"$keyCol >> 26").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ck")).as("min_ck"), max(col("ck")).as("max_ck"),
        min(col("od")).as("min_od"), max(col("od")).as("max_od"))

  /** One parquet row group's physical footer statistics on the (ck, od)
    * pair: byte size, row count, and the min/max envelope the scan
    * pruner actually sees. `minOd`/`maxOd` are epoch DAYS (parquet DATE
    * physical representation). */
  final case class RgStat(file: String, rows: Long, bytes: Long,
      minCk: Long, maxCk: Long, minOd: Int, maxOd: Int)

  /** Read every row-group footer under `path` (driver-side; bounded by
    * the file count, never by rows). */
  def footerStats(spark: SparkSession, path: String): Seq[RgStat] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .flatMap { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.toSeq.map { b =>
            val byName = b.getColumns.asScala
              .map(c => c.getPath.toDotString -> c).toMap
            val ck = byName("ck").getStatistics
            val od = byName("od").getStatistics
            RgStat(f.getPath.getName, b.getRowCount, b.getTotalByteSize,
              ck.genericGetMin.asInstanceOf[java.lang.Long],
              ck.genericGetMax.asInstanceOf[java.lang.Long],
              od.genericGetMin.asInstanceOf[java.lang.Integer],
              od.genericGetMax.asInstanceOf[java.lang.Integer])
          }
        } finally r.close()
      }
  }

  /** A pruning predicate as an inclusive envelope box over (ck, odDays):
    * None = unconstrained dimension. Mirrors what a footer pruner tests:
    * does the row group's [min,max] × [min,max] box intersect the
    * predicate's? */
  final case class Box(ckLo: Option[Long], ckHi: Option[Long],
      odLo: Option[Int], odHi: Option[Int]) {
    def hits(rg: RgStat): Boolean =
      ckLo.forall(rg.maxCk >= _) && ckHi.forall(rg.minCk <= _) &&
        odLo.forall(rg.maxOd >= _) && odHi.forall(rg.minOd <= _)
  }

  /** Footer-level pruning outcome of `box` over a layout's row groups:
    * (rowGroupsHit, rowGroupsTotal, filesHit, filesTotal, bytesHit,
    * bytesTotal). This is the skip decision a min/max pruner MUST make —
    * row groups whose envelope intersects the box cannot be skipped. */
  def pruneStats(rgs: Seq[RgStat], box: Box): (Long, Long, Long, Long, Long, Long) = {
    val hit = rgs.filter(box.hits)
    (hit.size.toLong, rgs.size.toLong,
      hit.map(_.file).distinct.size.toLong, rgs.map(_.file).distinct.size.toLong,
      hit.map(_.bytes).sum, rgs.map(_.bytes).sum)
  }
}
