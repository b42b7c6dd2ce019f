package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row at-or-before
  * it per key. An engine addition (the reference has no temporal joins;
  * Spark has no native ASOF): the standard union-sort-carry plan, ONE
  * shuffle on the key, then a per-key ordered window carrying the last
  * right payload forward. No range-explode, no per-left-row probe: cost
  * is sort(|L|+|R|) within each key — the plan that survives 100×.
  *
  * Matching uses `rts <= lts`; among equal right timestamps the highest
  * `rightId` wins (a deterministic tie rule — DuckDB's native ASOF JOIN
  * replays it after collapsing right rows to one per (key, ts)).
  */
object AsofJoin {

  /** Returns `left` columns plus `asof_<rightId>` = the matched right
    * row's id (null when no right row precedes).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           lts: String, rts: String, rightId: String): DataFrame = {
    val leftCols = left.columns
    val reserved = Set("__side", "__ts", "__rid")
    require(!leftCols.exists(reserved), s"left columns clash with $reserved")
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(lts))
      .withColumn("__rid", lit(null).cast("long"))
    val r = right.select(
      col(key),
      col(rts).as("__ts"),
      lit(0).as("__side"),
      col(rightId).cast("long").as("__rid"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at the same timestamp,
    // so an equal-timestamp right row IS visible (asof <=); among equal
    // right timestamps the last in (__ts, __side, __rid) order — the
    // max id — is carried
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$rightId", last(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col(s"asof_$rightId"): _*)
  }
}
