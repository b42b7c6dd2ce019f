package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Secondary sort: partition by a key prefix, order by the full key,
  * observe rows grouped by the prefix in secondary-key order.
  *
  * Reference: examples/SecondarySort.java:51-239 — FirstPartitioner (:133)
  * partitions on the first field, FirstGroupingComparator (:145) groups on
  * it, while the sort comparator orders by the whole (first, second) pair;
  * the general mechanism is Job.setSortComparatorClass /
  * setGroupingComparatorClass (mapreduce/Job.java:960-996).
  *
  * Spark-first: a window `partitionBy(key).orderBy(secondary)` gives the
  * same per-group ordering guarantee and shuffles once by the group key —
  * identical shuffle shape to the reference. For imperative per-group
  * streaming (the Reducer.run analog) use [[groupedIterator]].
  */
object SecondarySort {

  /** Rows with a 1-based sequence number within each group, ordered by
    * the secondary keys.
    */
  def withSequence(df: DataFrame, seqCol: String, part: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn(seqCol,
      row_number().over(Window.partitionBy(part: _*).orderBy(order: _*)))

  /** Physically cluster: one shuffle on the group key, rows sorted by
    * (group, secondary) within each partition. `mapPartitions` over the
    * result sees every group contiguously in secondary order — the exact
    * contract a Hadoop Reducer.run loop gets.
    */
  def clustered(df: DataFrame, numPartitions: Int, part: Seq[Column], order: Seq[Column]): DataFrame =
    df.repartition(numPartitions, part: _*)
      .sortWithinPartitions(part ++ order: _*)
}
