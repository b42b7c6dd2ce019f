package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BinaryPartitioner
  * (reference: mapreduce/lib/partition/BinaryPartitioner.java:40-120):
  * partition by a sub-range of a binary key's bytes, with python-style
  * offsets — left/right may be negative (counted from the end), and the
  * sub-array is INCLUSIVE of both offsets. Spark-first: the slice is a
  * codegen'd substring on the binary column and the partitioning is a
  * hash repartition on that slice — rows with equal sub-arrays co-locate,
  * which is the operator's whole contract.
  */
object BinaryPartition {

  /** 1-based start position and length of the inclusive [left, right]
    * byte range, resolving negative offsets against the value's length.
    */
  private def resolved(bin: Column, offset: Int): Column =
    if (offset >= 0) lit(offset + 1) else length(bin) + offset + 1

  def sliceExpr(bin: Column, left: Int = 0, right: Int = -1): Column = {
    val start = resolved(bin, left)
    val end = resolved(bin, right)
    bin.substr(start, end - start + 1)
  }

  /** Repartition so equal key sub-arrays land in the same partition. */
  def repartitionBySlice(df: DataFrame, binCol: String, numPartitions: Int,
                         left: Int = 0, right: Int = -1): DataFrame =
    df.repartition(numPartitions, sliceExpr(col(binCol), left, right))
}
