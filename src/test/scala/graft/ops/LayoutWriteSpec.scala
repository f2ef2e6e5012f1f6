package graft.ops

import org.apache.spark.sql.functions._

/** The layout WRITE path (VERDICT r15 item 2): q327/q329 predict per-
  * bucket envelopes; here the table is actually written per layout and
  * the REAL parquet row-group footers are read back. Two claims pinned:
  * (1) writing the audit's own bucketing yields physical footer stats
  * EQUAL to the audit's envelope rows — the audit measures exactly what
  * the files will carry; (2) on point/range/box predicates the curve
  * layouts' footers let a min/max pruner skip most bytes where the hash
  * layout can skip nothing. */
class LayoutWriteSpec extends graft.SparkSpec {

  private def ordersCkOd = graft.schema.Tables.t(spark, sf001, "orders")
    .select(col("o_custkey").as("ck"), to_date(col("o_orderdate")).as("od"))

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** audit rows keyed by bucket: (n_rows, min_ck, max_ck, min_od_days,
    * max_od_days) — od converted from the audit's TIMESTAMP render back
    * to epoch days, parquet DATE's physical unit. */
  private def auditRows(qname: String): Map[Long, (Long, Long, Long, Int, Int)] =
    graft.SparkEntry.queries(qname)(spark, sf001).collect().map { r =>
      def days(i: Int) = (r.getTimestamp(i).getTime / 86400000L).toInt
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), days(4), days(5))
    }.toMap

  private def checkFootersMatchAudit(qname: String, curveKey: String): Unit = {
    val audit = auditRows(qname)
    val frame = if (curveKey == "z") LayoutWrite.zFrame(ordersCkOd)
      else LayoutWrite.hilbertFrame(ordersCkOd)
    val path = tmp(s"layout-$curveKey")
    // one file per AUDIT bucket: hash-repartition on the bucket id sends
    // each bucket to exactly one task, partitionBy splits files by value
    frame.withColumn("bucket", expr(s"$curveKey >> 26"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    audit.foreach { case (bucket, (nRows, minCk, maxCk, minOd, maxOd)) =>
      val rgs = LayoutWrite.footerStats(spark, s"$path/bucket=$bucket")
      assert(rgs.nonEmpty, s"bucket $bucket missing from the written layout")
      assert(rgs.map(_.rows).sum === nRows, s"bucket $bucket row count")
      assert(rgs.map(_.minCk).min === minCk, s"bucket $bucket min_ck")
      assert(rgs.map(_.maxCk).max === maxCk, s"bucket $bucket max_ck")
      assert(rgs.map(_.minOd).min === minOd, s"bucket $bucket min_od")
      assert(rgs.map(_.maxOd).max === maxOd, s"bucket $bucket max_od")
    }
    // and nothing beyond the audit's buckets was written
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket=")).map(_.drop(7).toLong).toSet
    assert(dirs === audit.keySet)
  }

  test("q327 audit envelopes equal the written z-layout's physical footer stats") {
    checkFootersMatchAudit("q327_zorder_layout", "z")
  }

  test("q329 audit envelopes equal the written hilbert-layout's physical footer stats") {
    checkFootersMatchAudit("q329_hilbert_layout", "d")
  }

  test("curve layouts let the footer pruner skip where hash skips nothing") {
    val o = ordersCkOd
    val Seq(ckLo, ckHi, odLo, odHi) = {
      val b = o.agg(min("ck"), max("ck"),
        min(datediff(col("od"), lit("1970-01-01"))),
        max(datediff(col("od"), lit("1970-01-01")))).collect()(0)
      Seq(b.getLong(0), b.getLong(1), b.getInt(2).toLong, b.getInt(3).toLong)
    }
    val dirs = Seq("hash", "sort_ck", "zorder", "hilbert")
      .map(l => l -> tmp(s"prune-$l")).toMap
    val layouts = dirs.map { case (l, p) =>
      LayoutWrite.writeLayout(o, l, p, files = 16)
      l -> LayoutWrite.footerStats(spark, p)
    }
    // every layout writes the same rows
    assert(layouts.values.map(_.map(_.rows).sum).toSet.size === 1)

    val ckMid = (ckLo + ckHi) / 2
    val odMid = ((odLo + odHi) / 2).toInt
    val point = LayoutWrite.Box(Some(ckMid), Some(ckMid), None, None)
    val odRange = LayoutWrite.Box(None, None, Some(odMid), Some(odMid + 30))
    val box = LayoutWrite.Box(Some(ckMid), Some(ckMid + (ckHi - ckLo) / 16),
      Some(odMid), Some(odMid + 90))

    def frac(l: String, b: LayoutWrite.Box): Double = {
      val (_, _, fh, ft, _, _) = LayoutWrite.pruneStats(layouts(l), b)
      fh.toDouble / ft
    }
    // hash: every file's envelope spans the whole domain — nothing skips
    assert(frac("hash", point) === 1.0)
    assert(frac("hash", odRange) === 1.0)
    // single-column sort: minimal on its own dimension, blind off-dim
    assert(frac("sort_ck", point) <= 2.0 / 16)
    assert(frac("sort_ck", odRange) === 1.0)
    // curves: prune on BOTH dimensions — strictly better than hash
    // everywhere, and the box predicate (both dims constrained) skips
    // most files
    Seq("zorder", "hilbert").foreach { l =>
      assert(frac(l, point) < 1.0, s"$l point-ck prunes nothing")
      assert(frac(l, odRange) < 1.0, s"$l od-range prunes nothing")
      assert(frac(l, box) <= 0.5, s"$l box touches ${frac(l, box)} of files")
    }
    // the pruned set is SAFE: footer-hit row groups contain every
    // matching row (count over pruned files == count over the table)
    val expect = o.filter(col("ck").between(ckMid, ckMid + (ckHi - ckLo) / 16) &&
      datediff(col("od"), lit("1970-01-01")).between(odMid, odMid + 90)).count()
    Seq("zorder", "hilbert", "sort_ck", "hash").foreach { l =>
      val hitFiles = layouts(l).filter(box.hits).map(_.file).distinct
      val got = spark.read.parquet(hitFiles.map(f => s"${dirs(l)}/$f"): _*)
        .filter(col("ck").between(ckMid, ckMid + (ckHi - ckLo) / 16) &&
          datediff(col("od"), lit("1970-01-01")).between(odMid, odMid + 90)).count()
      assert(got === expect, s"$l pruned set dropped matching rows")
    }
  }
}
