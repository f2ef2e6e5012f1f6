package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.ops.Loops._

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
  * Scale shape: q334 is the EXACT all-pairs baseline (the q44 posture);
  * q335 is the SHIP PATH — both pools assigned to q59's coarse IVF
  * cells, candidates generated only by the cell equi-join (nprobe=4 on
  * the source side), margins/mutual-best riding the identical
  * [[minePairs]]. The ScaleBench mining ladder (SCALE.md round 15)
  * measured the blocked form 20–60× below exact with recall 1.00 at
  * nprobe=4 on a clustered corpus; on the driver's weakly-clustered
  * synthetic table the mutual-pair recall is ~0.6–0.7 (pinned in
  * BitextMiningSpec). k = 4 neighbor means, avg'd over the candidates
  * that actually exist (a blocked cell can hold fewer than k).
  */
object MiningOps {

  private val K = 4

  /** nprobe=4 (the q59/q106 recall dial): the ScaleBench mining ladder
    * measured single-probe recall collapsing as coarse cells fragment
    * clusters and nprobe=4 restoring recall 1.00 at every size.
    * Defined BEFORE `qs` — the oracle SQL interpolates it eagerly. */
  private val NProbe = 4

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
    * `mining` phase) — margins are per-candidate arithmetic either way.
    *
    * Plan-shape notes from the round-16 optimization pass, kept so the
    * next round does not re-walk dead ends: the per-side `row_number`
    * window + `r <= k` filter plans as WindowGroupLimit — a partial
    * per-map-task top-k BEFORE the exchange (≤k rows per group per task
    * cross the wire) and the full N²/4 frame is never shuffled. Three
    * restructures all measured WORSE than this fused-codegen shape at
    * sf0.1: (a) localCheckpoint of the pair frame (checkpoint write+read
    * of 1M narrow rows ≈ 7 cpu-s, more than recomputing the cross join);
    * (b) a lazy pin raced its materialization across the four parallel
    * branch stages (4× concurrent compute); (c) a bounded typed top-k
    * Aggregator (ObjectHashAggregate) paid ~15 µs/row on the
    * encode/decode boundary — 3× the whole window stage. What DID pay:
    * precomputing the per-side norms (3 array dots per pair → 1) and an
    * explicit repartition so the compute-heavy tiny-byte stages spread
    * over the cluster dial instead of AQE-coalescing to one task. */
  def minePairs(pairs: org.apache.spark.sql.DataFrame, k: Int = K)
      : org.apache.spark.sql.DataFrame = {
    // avg, not sum/k: on a blocked candidate frame a side can hold fewer
    // than k in-cell neighbors, and sum/k would deflate its mean and
    // inflate the margin (ADVICE r15). When exactly k rows survive the
    // filter, avg = sum/count is the identical double division.
    val rx = pairs.withColumn("r", row_number().over(
      Window.partitionBy(col("sx")).orderBy(col("cos").desc, col("ty"))))
    val kxm = rx.filter(col("r") <= k).groupBy(col("sx"))
      .agg(avg(col("cos")).as("mx"))
    val ry = pairs.withColumn("r", row_number().over(
      Window.partitionBy(col("ty")).orderBy(col("cos").desc, col("sx"))))
    val kym = ry.filter(col("r") <= k).groupBy(col("ty"))
      .agg(avg(col("cos")).as("my"))
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
         |kx AS (SELECT sx, avg(cos) AS mx FROM rx WHERE r <= $K GROUP BY sx),
         |ry AS (SELECT sx, ty, cos,
         |    row_number() OVER (PARTITION BY ty ORDER BY cos DESC, sx) AS r
         |  FROM pairs),
         |ky AS (SELECT ty, avg(cos) AS my FROM ry WHERE r <= $K GROUP BY ty),
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
      // Norms precomputed per SIDE, not per pair (OPTIMIZATION_r16): the
      // original evaluated graft_dot(xe,xe) and graft_dot(ye,ye) inside
      // the N² frame — each vector's self-dot recomputed ~N times. nx/ny
      // are the identical doubles (normExpr is deterministic per row), so
      // round(dot/(nx·ny), 9) is value-identical; the quadratic stage now
      // runs ONE array dot per pair instead of three.
      // The quadratic stage is compute-bound on TINY bytes (N rows in, N²
      // dots): the scan is one partition and AQE's advisory-size
      // coalescing keeps every downstream stage at one task. Spread the
      // stream side explicitly — spark.sql.shuffle.partitions is the
      // session's scale-adaptive parallelism dial (cores locally,
      // thousands on a cluster), and an explicit repartition is exempt
      // from AQE coalescing by design.
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val xs = emb.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("sx"), col("embedding").as("xe"),
          VectorSearch.normExpr("embedding").as("nx"))
        .repartition(parts)
      val ys = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("ty"), col("embedding").as("ye"),
          VectorSearch.normExpr("embedding").as("ny"))
      // The explicit (sx, ty) repartition below is the frame's shared
      // REUSE POINT (guide §2.4): minePairs' kx/bx and ky/bty branch
      // pairs all sit on the identical exchange, so the N² cross join +
      // dot executes ONCE and every branch re-reads the narrow 24-byte
      // rows from the shuffle — a checkpoint-free materialization that
      // measured cheaper than both the recompute-per-branch baseline and
      // a localCheckpoint pin (scaladoc on minePairs).
      val pairs = xs.crossJoin(ys)
        .select(col("sx"), col("ty"),
          round(VectorSearch.dotExpr("xe", "ye") / (col("nx") * col("ny")), 9)
            .as("cos"))
        .repartition(parts, col("sx"), col("ty"))
      minePairs(pairs).orderBy(col("src_id"))
    },

    // ---- q335: IVF-blocked bitext mining — the 100 TB ship path ----
    // The same miner with the quadratic pair source replaced: both pools
    // are assigned to q59's coarse centroids (6dp label means — tiny,
    // broadcast as ONE collected row, so assignment is per-row arithmetic
    // with NO shuffle and NO window), the source side probes its nprobe=4
    // nearest cells (ScaleBench mining ladder, SCALE.md round 15:
    // single-probe recall craters 1.00→0.48 as cells fragment clusters;
    // nprobe=4 restores 1.00 at every ladder size, 20–60× below exact),
    // the target side indexes single-cell, and candidates are the
    // EQUI-JOIN on cell id — never a cross join (plan-asserted in
    // PlanShapeSpec). Margins/mutual-best ride the UNCHANGED [[minePairs]]
    // (within-cell neighbor means — the honest blocked approximation).
    // (sx, ty) needs no dedup: the target is in exactly one cell, so a
    // pair appears at most once however many cells the source probes.
    Q("q335_bitext_mining_blocked", {
      def cosSql(a: String, b: String) =
        s"""(list_sum(list_transform(range(1, len($a) + 1),
           |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
           | / (sqrt(list_sum(list_transform(range(1, len($a) + 1),
           |    i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
           |  * sqrt(list_sum(list_transform(range(1, len($b) + 1),
           |    i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin
      s"""WITH xs AS (SELECT vec_id AS sx, embedding AS xe FROM embeddings WHERE vec_id % 2 = 0),
         |ys AS (SELECT vec_id AS ty, embedding AS ye FROM embeddings WHERE vec_id % 2 = 1),
         |pos AS (SELECT label, generate_subscripts(embedding, 1) AS i,
         |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
         |cent AS (SELECT label, list(round(avg_v, 6) ORDER BY i) AS centroid
         |         FROM (SELECT label, i, avg(val) AS avg_v FROM pos GROUP BY label, i)
         |         GROUP BY label),
         |xr AS (SELECT sx, xe, label, row_number() OVER (PARTITION BY sx
         |         ORDER BY round(${cosSql("xe", "centroid")}, 9) DESC, label) AS cr
         |       FROM xs, cent),
         |xa AS (SELECT sx, xe, label FROM xr WHERE cr <= $NProbe),
         |yr AS (SELECT ty, ye, label, row_number() OVER (PARTITION BY ty
         |         ORDER BY round(${cosSql("ye", "centroid")}, 9) DESC, label) AS cr
         |       FROM ys, cent),
         |ya AS (SELECT ty, ye, label FROM yr WHERE cr = 1),
         |pairs AS (SELECT sx, ty, round(${cosSql("xe", "ye")}, 9) AS cos
         |          FROM xa JOIN ya USING (label)),
         |rx AS (SELECT sx, ty, cos,
         |    row_number() OVER (PARTITION BY sx ORDER BY cos DESC, ty) AS r
         |  FROM pairs),
         |kx AS (SELECT sx, avg(cos) AS mx FROM rx WHERE r <= $K GROUP BY sx),
         |ry AS (SELECT sx, ty, cos,
         |    row_number() OVER (PARTITION BY ty ORDER BY cos DESC, sx) AS r
         |  FROM pairs),
         |ky AS (SELECT ty, avg(cos) AS my FROM ry WHERE r <= $K GROUP BY ty),
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
      // same parallelism posture as q334: the per-row 100-cell probe sort
      // is compute-bound on tiny bytes; spread it instead of letting AQE
      // coalesce the one-file scan's stage to a single task
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val xs = emb.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("sx"), col("embedding").as("xe"))
        .repartition(parts)
      val ys = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("ty"), col("embedding").as("ye"))
        .repartition(parts)
      val centRow = VectorSearch.ivfCentroids(s, dir)
        .agg(array_sort(collect_list(struct(col("label"), col("centroid"),
          VectorSearch.normExpr("centroid").as("nc")))).as("__cents"))
      // Pin each side's cell assignment (OPTIMIZATION_r16): minePairs'
      // two side aggregates would otherwise re-embed BOTH probeCells
      // subtrees (the per-row 100-cell array_sort is the expensive step)
      // in each branch plan. Pinning xa/ya (eager — a lazy pin raced its
      // materialization across the parallel branch stages) runs each
      // assignment once over a few thousand narrow rows; the cell
      // equi-join stays in the final plan (PlanShapeSpec's q335
      // assertion). The norm column probeCells already computes rides
      // along so the candidate cosine pays one array dot per pair
      // instead of three — identical doubles (normExpr is deterministic
      // per row).
      val xa = probeCells(xs, centRow, "sx", "xe", nprobe = NProbe).pin()
      val ya = probeCells(ys, centRow, "ty", "ye", nprobe = 1).pin()
      val cand = xa.join(ya, Seq("label"))
        .select(col("sx"), col("ty"),
          round(VectorSearch.dotExpr("xe", "ye")
            / (col("__nv_sx") * col("__nv_ty")), 9).as("cos"))
      minePairs(cand).orderBy(col("src_id"))
    }
  )

  /** Assign each vector of `vs` to the `nprobe` nearest coarse cells by
    * 9dp-rounded centroid cosine (ties → lower label). `centRow` is the
    * ONE-row (label, centroid, nc) array frame (|labels| entries —
    * catalog-sized), broadcast so assignment is per-row array arithmetic:
    * no shuffle, no window — the [[VectorSearch.assignToSeeds]] posture
    * generalized to top-p. Output: (idCol, embCol, __nv_<idCol>, label) —
    * one row per probed cell; the vector's norm (already computed for the
    * centroid cosines) rides along so downstream pair cosines need no
    * re-derivation. */
  private def probeCells(vs: org.apache.spark.sql.DataFrame,
      centRow: org.apache.spark.sql.DataFrame, idCol: String,
      embCol: String, nprobe: Int): org.apache.spark.sql.DataFrame = {
    val cosIn = s"round(graft_dot($embCol, c.centroid) / (__nv * c.nc), 9)"
    vs.withColumn("__nv", VectorSearch.normExpr(embCol))
      .crossJoin(broadcast(centRow))
      .select(col(idCol), col(embCol), col("__nv"),
        explode(slice(expr(
          s"array_sort(transform(__cents, c -> struct(-$cosIn AS negcos, c.label AS label)))"),
          1, nprobe)).as("cell"))
      .select(col(idCol), col(embCol), col("__nv").as(s"__nv_$idCol"),
        col("cell.label").as("label"))
  }
}
