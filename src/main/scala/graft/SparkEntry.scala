package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator category contributes a (queries, oracleSql) pair; names are
  * the stable keys from SURVEY.md §2 that the driver hash-scores per query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++
      FilterProject.queries ++
      Aggregations.queries ++
      Windows.queries ++
      SetOps.queries ++
      SqlText.queries ++
      TpchSuite.queries ++
      Graphs.queries ++
      TypedApi.queries ++
      Joins.queries ++
      TimeSeries.queries ++
      graft.functions.ScalarFns.queries ++
      graft.llm.TextAnalysis.queries ++
      graft.llm.Dedup.queries ++
      graft.llm.Pipeline.queries ++
      graft.llm.Similarity.queries ++
      graft.llm.Multimodal.queries ++
      graft.streaming.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracleSql ++
      FilterProject.oracleSql ++
      Aggregations.oracleSql ++
      Windows.oracleSql ++
      SetOps.oracleSql ++
      SqlText.oracleSql ++
      TpchSuite.oracleSql ++
      Graphs.oracleSql ++
      TypedApi.oracleSql ++
      Joins.oracleSql ++
      TimeSeries.oracleSql ++
      graft.functions.ScalarFns.oracleSql ++
      graft.llm.TextAnalysis.oracleSql ++
      graft.llm.Dedup.oracleSql ++
      graft.llm.Pipeline.oracleSql ++
      graft.llm.Similarity.oracleSql ++
      graft.llm.Multimodal.oracleSql ++
      graft.streaming.StreamingQueries.oracleSql
}
