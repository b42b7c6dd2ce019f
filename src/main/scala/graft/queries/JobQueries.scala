package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.jobs.TeraSort

/** Self-validating jobs (no DuckDB oracle — they carry their own
  * validator, the SortValidator/TeraValidate pattern of SURVEY §5.3).
  */
object JobQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TeraGen -> TeraSort -> TeraValidate, sized to the scale factor
    // (100 bytes/row: sf0.1 -> 1 GB). The returned row is the validator
    // verdict; rows-only driver check, correctness asserted in-query.
    "terasort" -> ((s, dir) => {
      val rows =
        if (dir.contains("sf0.1")) 10000000L
        else if (dir.contains("sf0.01")) 1000000L
        else 100000L
      val sorted = TeraSort.teraSort(TeraSort.teraGen(s, rows, 32), 32)
      val (ok, count) = TeraSort.teraValidate(sorted)
      require(ok && count == rows, s"terasort validation failed: ok=$ok count=$count")
      import s.implicits._
      Seq((rows, ok, count)).toDF("rows", "sorted_ok", "row_count")
    })
  )

  def oracleSql: Map[String, String] = Map.empty
}
