package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q

/** Margin-based bitext mining — the LASER/CCMatrix recipe for mining
  * parallel training pairs out of two monolingual embedding pools:
  * raw cosine over-fires in dense hubs, so each candidate is scored by
  * the RATIO margin cos(x, y) / ((kNN̄(x) + kNN̄(y)) / 2) (Artetxe &
  * Schwenk 2019), and a pair ships only when it is the MUTUAL best in
  * both directions. The reference moves opaque payloads; cross-lingual
  * pair mining extends the similarity surface per the north star.
  *
  * The two "languages" are the embedding table's parity halves —
  * synthetic, but every number is real engine output: per-pair cosine
  * (rounded 9 dp before any window, the q110 discipline), top-k means,
  * bidirectional argmax, and the margin itself.
  *
  * Scale shape: this is the EXACT all-pairs baseline (the q44 posture)
  * — at 100 TB mining rides the same blocked candidate generation the
  * ANN family already ships (q45 LSH buckets / q59 IVF cells / q294
  * IVF-PQ), scoring only in-cell pairs; margins and mutual-best are
  * per-candidate arithmetic either way, so swapping the pair source is
  * the only change. k = 4 neighbor means; both halves are orders of
  * magnitude larger than k at every SF.
  */
object MiningOps {

  private val K = 4

  /** 9 dp-rounded cosine between the `xe`/`ye` embedding columns of a
    * candidate frame — the shared scoring column for the exact and
    * blocked pair sources (needs graft_dot; [[VectorSearch.embTable]]
    * or GraftFunctions.register must have run in the session). */
  def pairCos: org.apache.spark.sql.Column = cosOf("xe", "ye")

  /** 9 dp-rounded cosine between two named embedding columns. */
  def cosOf(a: String, b: String): org.apache.spark.sql.Column =
    round(VectorSearch.dotExpr(a, b)
      / (VectorSearch.normExpr(a) * VectorSearch.normExpr(b)), 9)

  /** The mining pipeline over ANY (sx, ty, cos) candidate frame: top-k
    * neighbor means per side, best-per-source with margin, mutual-best
    * flag. The frame is the only thing that changes between the exact
    * all-pairs baseline (q334) and the IVF-blocked form (ScaleBench
    * `mining` phase) — margins are per-candidate arithmetic either way. */
  def minePairs(pairs: org.apache.spark.sql.DataFrame, k: Int = K)
      : org.apache.spark.sql.DataFrame = {
    val rx = pairs.withColumn("r", row_number().over(
      Window.partitionBy(col("sx")).orderBy(col("cos").desc, col("ty"))))
    val kxm = rx.filter(col("r") <= k).groupBy(col("sx"))
      .agg((sum(col("cos")) / k).as("mx"))
    val ry = pairs.withColumn("r", row_number().over(
      Window.partitionBy(col("ty")).orderBy(col("cos").desc, col("sx"))))
    val kym = ry.filter(col("r") <= k).groupBy(col("ty"))
      .agg((sum(col("cos")) / k).as("my"))
    val bx = rx.filter(col("r") === 1).select(col("sx"), col("ty"), col("cos"))
    val bty = ry.filter(col("r") === 1).select(col("ty"), col("sx").as("bsx"))
    bx.join(kxm, Seq("sx"))
      .join(kym, Seq("ty"))
      .join(bty, Seq("ty"))
      .select(col("sx").as("src_id"), col("ty").as("tgt_id"),
        round(col("cos"), 6).as("cos_sim"),
        round(col("cos") / ((col("mx") + col("my")) / 2), 6).as("margin"),
        (col("bsx") === col("sx")).as("mutual"))
  }

  val qs: Seq[Q] = Seq(

    // ---- q334: margin-based parallel-pair mining ----
    Q("q334_bitext_mining", {
      s"""WITH xs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
         |ys AS (SELECT vec_id, embedding AS qe FROM embeddings WHERE vec_id % 2 = 1),
         |pairs AS (SELECT xs.vec_id AS sx, ys.vec_id AS ty,
         |    round(${VectorSearch.DuckCos}, 9) AS cos
         |  FROM xs, ys),
         |rx AS (SELECT sx, ty, cos,
         |    row_number() OVER (PARTITION BY sx ORDER BY cos DESC, ty) AS r
         |  FROM pairs),
         |kx AS (SELECT sx, sum(cos) / $K AS mx FROM rx WHERE r <= $K GROUP BY sx),
         |ry AS (SELECT sx, ty, cos,
         |    row_number() OVER (PARTITION BY ty ORDER BY cos DESC, sx) AS r
         |  FROM pairs),
         |ky AS (SELECT ty, sum(cos) / $K AS my FROM ry WHERE r <= $K GROUP BY ty),
         |bx AS (SELECT sx, ty, cos FROM rx WHERE r = 1),
         |bty AS (SELECT ty, sx AS bsx FROM ry WHERE r = 1)
         |SELECT b.sx AS src_id, b.ty AS tgt_id,
         |  round(b.cos, 6) AS cos_sim,
         |  round(b.cos / ((kx.mx + ky.my) / 2), 6) AS margin,
         |  (bty.bsx = b.sx) AS mutual
         |FROM bx b
         |JOIN kx USING (sx)
         |JOIN ky ON ky.ty = b.ty
         |JOIN bty ON bty.ty = b.ty
         |ORDER BY src_id""".stripMargin
    }) { (s, dir) =>
      val emb = VectorSearch.embTable(s, dir)
      val xs = emb.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("sx"), col("embedding").as("xe"))
      val ys = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("ty"), col("embedding").as("ye"))
      val pairs = xs.crossJoin(ys)
        .select(col("sx"), col("ty"),
          round(VectorSearch.dotExpr("xe", "ye")
            / (VectorSearch.normExpr("xe") * VectorSearch.normExpr("ye")), 9)
            .as("cos"))
      minePairs(pairs).orderBy(col("src_id"))
    }
  )
}
