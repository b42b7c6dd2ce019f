package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB oracle SQL (where the
  * semantics are SQL-expressible; others get the driver's rows-only check).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
