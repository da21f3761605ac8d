package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.flatten.FlattenQueries
import graft.functions.ScalarQueries
import graft.llm.{Curation, Dedup, DedupStress, MinHashAgg, Multimodal, PipelinePrep, Retrieval, Similarity, TextAnalysis, Tokenize}
import graft.operators.{Analytics, DataProfile, GraphOps, PipelineOps, TimeSeries}
import graft.report.HealthReport
import graft.scale.ScaleQueries
import graft.sink.SinkQueries
import graft.source.SourceQueries
import graft.streaming.{SessionStream, StreamQueries}
import graft.table.TableQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented SURVEY.md §2 operator key;
  * `oracleSql` the DuckDB-equivalent SQL for each (omitted only for
  * non-SQL-expressible ops, which get a rows-only check).
  */
object SparkEntry {

  /** Flagship query (the reference's daily-metrics CTE + LAG report,
    * `advanced_monitoring.py:54-75`) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.dailyMetrics(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ ScalarQueries.queries ++ FlattenQueries.queries ++
      SourceQueries.queries ++ SinkQueries.queries ++ Dedup.queries ++
      DedupStress.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      StreamQueries.queries ++ MinHashAgg.queries ++ Curation.queries ++
      PipelineOps.queries ++ PipelinePrep.queries ++ GraphOps.queries ++
      SessionStream.queries ++ Tokenize.queries ++ TableQueries.queries ++
      Retrieval.queries ++ TimeSeries.queries ++ DataProfile.queries ++
      ScaleQueries.queries ++ HealthReport.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ ScalarQueries.oracles ++ FlattenQueries.oracles ++
      SourceQueries.oracles ++ SinkQueries.oracles ++ Dedup.oracles ++
      DedupStress.oracles ++
      Similarity.oracles ++ TextAnalysis.oracles ++ Multimodal.oracles ++
      StreamQueries.oracles ++ MinHashAgg.oracles ++ Curation.oracles ++
      PipelineOps.oracles ++ PipelinePrep.oracles ++ GraphOps.oracles ++
      SessionStream.oracles ++ Tokenize.oracles ++ TableQueries.oracles ++
      Retrieval.oracles ++ TimeSeries.oracles ++ DataProfile.oracles ++
      ScaleQueries.oracles ++ HealthReport.oracles
}
