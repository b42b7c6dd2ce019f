package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears as one entry in
  * [[queries]]; entries with a DuckDB-expressible oracle also appear in
  * [[oracleSql]] (column names/types aligned on both sides — the driver
  * sorts columns by name and hash-compares values).
  */
object SparkEntry {

  private[graft] val modules: Seq[QueryModule] =
    Seq(CoreQueries, TextQueries, EventQueries, DedupQueries,
      SimilarityQueries, ToolQueries, MultimodalQueries, JobQueries,
      DbQueries, PipelineQueries, RetrievalQueries, CleanQueries,
      GraphQueries, StatsQueries, StreamingQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q5_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
