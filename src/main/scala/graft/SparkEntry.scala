package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator in SURVEY.md §2 is a [[Q]] in one of the ops modules;
  * `queries`/`oracleSql` are assembled from those. */
object SparkEntry {

  private[graft] def allQs: Seq[Q] =
    ops.Relational.qs ++ ops.Ingest.qs ++ ops.Streamingish.qs ++
      ops.TextDedup.qs ++ ops.VectorSearch.qs ++ ops.TextAnalysis.qs ++
      ops.Multimodal.qs ++ ops.Extras.qs ++ ops.Curation.qs ++ ops.SqlSurface.qs ++
      ops.SubstringOps.qs ++ ops.GraphOps.qs ++ ops.ImageOps.qs ++ ops.AudioOps.qs ++
      ops.PipelineOps.qs ++ ops.StatsGeo.qs ++ ops.Stats2.qs ++ ops.Lttb.qs ++
      ops.ModelEval.qs ++ ops.SetSketches.qs ++ ops.Dictionary.qs ++ ops.Governance.qs ++
      ops.TimeSeries.qs ++ ops.VideoOps.qs ++ ops.Stats3.qs ++ ops.Fuzzy.qs ++ ops.CorpusStats.qs ++
      ops.Mp3Ops.qs ++ ops.H264Ops.qs ++ ops.WarcOps.qs ++ ops.HtmlOps.qs ++
      ops.PdfOps.qs ++ ops.EncodingOps.qs ++ ops.UrlOps.qs ++ ops.RobotsOps.qs ++
      ops.ChatOps.qs ++ ops.ClassifierOps.qs ++ ops.SelectionOps.qs ++
      ops.BlocklistOps.qs ++ ops.BloomOps.qs ++ ops.SnapshotOps.qs ++
      ops.LayoutOps.qs ++ ops.FrontierOps.qs ++ ops.LinkOps.qs ++
      ops.MiningOps.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible ops (rows-only check). */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
