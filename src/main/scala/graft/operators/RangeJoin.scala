package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join — points to their containing intervals, as
  * equi-joins (engine addition; Spark plans a naive
  * `p BETWEEN lo AND hi` join as BroadcastNestedLoop/cartesian, which
  * cannot survive scale).
  *
  * Intervals explode to the fixed-width bins they cover; a point hashes
  * to its single bin; the join is an equi-join on (key, bin) with the
  * exact containment predicate as a post-filter. Cost:
  * |intervals| · bins-per-interval + |points| shuffled rows, all
  * hash-partitioned — `binSize` trades the interval explode factor
  * against candidates sharing a bin (pick ≈ the median interval
  * length).
  */
object RangeJoin {

  /** Column names must be distinct between `points` and `intervals`
    * apart from the shared `key`.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      ptCol: String, loCol: String, hiCol: String,
                      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "column __bin is reserved")
    val binned = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binSize), floor(col(hiCol) / binSize))))
    points.withColumn("__bin", floor(col(ptCol) / binSize))
      .join(binned, Seq(key, "__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
