package graft.jobs

import java.util.{Arrays => JArrays}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TeraSort suite re-expressed Spark-first.
  *
  * Reference: examples/terasort/ — TeraGen (TeraGen.java:203-225,
  * deterministic per-row generation), TeraSort (custom trie total-order
  * partitioner, TeraSort.java:58-214), TeraValidate (global order check
  * + checksum, TeraValidate.java:53-88), TeraChecksum. Record layout per
  * TeraInputFormat.java:55-112: 100-byte rows, first 10 bytes = key.
  *
  * Deviations, by design:
  *  - Generation is deterministic from the row id via md5 (seedless and
  *    reproducible for any row range) but NOT bit-identical to GenSort's
  *    RNG — self-validation (count + order + order-independent checksum
  *    before/after) replaces binary comparison against gensort output.
  *  - Partitioning uses Spark's sampled RangePartitioner
  *    (`repartitionByRange`) instead of the 2-level trie
  *    TotalOrderPartitioner — same contract (partition i's keys all <=
  *    partition i+1's), no driver-side partition file.
  */
object TeraSort {

  /** `rows` deterministic 100-byte records: key = 10 bytes, value = 90. */
  def teraGen(spark: SparkSession, rows: Long, partitions: Int): DataFrame =
    spark.range(0, rows, 1, partitions).select(
      expr("substring(unhex(md5(cast(id as string))), 1, 10)").as("key"),
      expr(
        """substring(concat(
          |  unhex(md5(concat('v0:', cast(id as string)))),
          |  unhex(md5(concat('v1:', cast(id as string)))),
          |  unhex(md5(concat('v2:', cast(id as string)))),
          |  unhex(md5(concat('v3:', cast(id as string)))),
          |  unhex(md5(concat('v4:', cast(id as string)))),
          |  unhex(md5(concat('v5:', cast(id as string))))), 1, 90)""".stripMargin).as("value"))

  /** Total-order sort by the binary key (unsigned byte order — Spark's
    * BinaryType ordering matches BytesWritable's comparator).
    */
  def teraSort(records: DataFrame, partitions: Int): DataFrame =
    records.repartitionByRange(partitions, col("key"))
      .sortWithinPartitions(col("key"))

  /** Order-independent checksum: XOR of per-record digests — invariant
    * under any shuffle/sort, so checksum(gen) == checksum(sorted) iff no
    * record was lost or corrupted (the SortValidator.java:97-168 idea).
    */
  def teraChecksum(records: DataFrame): Long =
    records.select(
      expr("bit_xor(cast(conv(substring(md5(concat(hex(key), hex(value))), 1, 15), 16, 10) as bigint))")
        .as("cs"))
      .head().getLong(0)

  final case class PartitionReport(part: Int, count: Long, sorted: Boolean,
                                   first: Array[Byte], last: Array[Byte])

  /** TeraValidate: every partition internally sorted, partition boundary
    * keys non-decreasing across partitions, and total count preserved.
    * One pass, no driver-side data movement beyond one row per partition.
    */
  def teraValidate(sorted: DataFrame): (Boolean, Long) = {
    val reports = sorted.select("key").rdd.mapPartitionsWithIndex { (idx, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        var first: Array[Byte] = null
        var last: Array[Byte] = null
        var count = 0L
        var ok = true
        while (it.hasNext) {
          val k = it.next().getAs[Array[Byte]](0)
          if (first == null) first = k
          if (last != null && JArrays.compareUnsigned(last, k) > 0) ok = false
          last = k
          count += 1
        }
        Iterator(PartitionReport(idx, count, ok, first, last))
      }
    }.collect().sortBy(_.part)
    val locallySorted = reports.forall(_.sorted)
    val boundariesOk = reports.sliding(2).forall {
      case Array(a, b) => JArrays.compareUnsigned(a.last, b.first) <= 0
      case _           => true
    }
    (locallySorted && boundariesOk, reports.map(_.count).sum)
  }
}
