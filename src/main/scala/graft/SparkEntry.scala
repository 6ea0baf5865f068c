package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry implements and §5 for the cross-engine determinism rules. */
object SparkEntry {

  /** Every implemented checklist entry, one Q per SURVEY.md §2 row. */
  val allQ: Seq[Q] =
    operators.Relational.all ++
      operators.Relational2.all ++
      operators.Analytics.all ++
      operators.Analytics2.all ++
      operators.Scoring.all ++
      operators.GraphOps.all ++
      operators.GraphOps2.all ++
      operators.Events.all ++
      operators.Events2.all ++
      operators.LoaderOps.all ++
      operators.AsofJoin.all ++
      operators.IngestOps.all ++
      operators.ProvenanceOps.all ++
      operators.Repair.all ++
      operators.Intervals.all ++
      operators.Stats.all ++
      operators.ReleaseOps.all ++
      operators.SchemaDrift.all ++
      operators.CboDemo.all ++
      ops.Retrieval.all ++
      ops.TextAnalysis.all ++
      ops.TextAnalysis2.all ++
      ops.CorpusQuality.all ++
      ops.CorpusQuality2.all ++
      ops.Dedup.all ++
      ops.EmbedQC.all ++
      ops.PipelineOps.all ++
      ops.PipelineOps2.all ++
      ops.PipelineOps3.all ++
      ops.PipelineOps4.all ++
      ops.Similarity.all ++
      ops.Sketches.all ++
      ops.Multimodal.all ++
      sources.SidecarStats.all ++
      streaming.Backfill.all ++
      streaming.MixMonitor.all ++
      plans.TopKQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.qRegionVolume.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
