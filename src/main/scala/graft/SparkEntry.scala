package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Concatenation of the per-family query maps (SURVEY §7.5).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ Windows.queries ++
      Functions.queries ++ Sync.queries ++ LlmPipeline.queries ++
      Streaming.queries ++ Multimodal.queries ++ Multimodal.queries2 ++
      Sources.queries ++ SqlQueries.queries ++ DataPrep.queries ++
      Fuzz.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Aggregates.oracle ++ Windows.oracle ++
      Functions.oracle ++ Sync.oracle ++ LlmPipeline.oracle ++
      Streaming.oracle ++ Multimodal.oracle ++ Sources.oracle ++
      SqlQueries.oracle ++ DataPrep.oracle ++ Fuzz.oracleSql
}
