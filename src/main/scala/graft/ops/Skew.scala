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
}
