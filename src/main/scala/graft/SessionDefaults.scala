package graft

import org.apache.spark.sql.SparkSession

/** Shared session tuning for every graft runner main (Bench, Verify,
  * Explain, StageProfile, ScaleBench, IngestBench) and the test session.
  *
  * Why these two confs (round-8 q100 audit, StageProfile A/B at sf0.1):
  *
  *  - `canChangeCachedPlanOutputPartitioning=true` — the operator library
  *    leans on CacheRegistry-persisted frames (shingles, band rows, kNN
  *    edges). By default Spark pins a cached plan's output partitioning,
  *    which EXEMPTS the cache-building shuffle from AQE coalescing: every
  *    persisted frame materializes at `spark.sql.shuffle.partitions`
  *    partitions no matter how small it is, and every downstream consumer
  *    launches that many tasks per stage. At sf0.1 the shingle cache is
  *    ~8 MB across 32 partitions, and q100 alone ran 526 tasks: 70.8
  *    task-s / 29.9 cpu-s for 12.1 task-s / 5.5 cpu-s of actual work
  *    (5.9× / 5.4×) once AQE may size the cached plan's partitions. The
  *    cost of `true` is a possible extra shuffle when a consumer needs the
  *    pinned partitioning — none of our consumers do (they re-shuffle on
  *    their own keys anyway).
  *
  *  - `coalescePartitions.parallelismFirst=false` — honor
  *    `advisoryPartitionSizeInBytes` (64 MB default) instead of splitting
  *    post-shuffle output down to 1 MB chunks to chase core count. This is
  *    the scale-correct policy: partition count grows with BYTES (at
  *    100 TB a shuffle still fans out to thousands of partitions), while
  *    small intermediates collapse to a handful of tasks instead of
  *    `shuffle.partitions` near-empty ones. Spark's own docs recommend
  *    exactly this off-switch when the advisory size should win.
  *
  * `SPARK_GRAFT_CONF="k=v;k2=v2"` applies last for A/B experiments without
  * a rebuild. */
object SessionDefaults {
  /** `applyEnv = false` (the test session) keeps the AQE policy but
    * ignores SPARK_GRAFT_CONF: an exported A/B experiment for Bench must
    * not silently re-configure the whole test suite's pinned confs. */
  def tune(b: SparkSession.Builder, applyEnv: Boolean = true): SparkSession.Builder = {
    b.config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    if (applyEnv)
      sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
        .foreach { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => b.config(k, v)
            case _ => System.err.println(
              s"[graft] ignoring malformed SPARK_GRAFT_CONF entry '$kv' (want k=v)")
          }
        })
    b
  }
}
