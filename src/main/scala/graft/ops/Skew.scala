package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    val parted = df.repartitionByRange(numPartitions, order: _*)
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint() // pin bucket assignment across the two passes
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
}
