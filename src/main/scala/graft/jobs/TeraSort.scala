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

  /** `rows` deterministic 100-byte records: key = 10 bytes, value = 90.
    * Keys are md5-derived (uniform, adversarial to range sampling like
    * gensort's RNG); the value is one hash stretched to 90 bytes —
    * gensort's own values are structured filler (record number + break +
    * filler, TeraGen.java:203-225), so payload entropy is not part of
    * the workload, but every row's value is still row-unique.
    */
  def teraGen(spark: SparkSession, rows: Long, partitions: Int): DataFrame =
    spark.range(0, rows, 1, partitions).select(
      expr("substring(unhex(md5(cast(id as string))), 1, 10)").as("key"),
      // repeat in hex-string space (repeat on BINARY would cast through
      // UTF-8 and corrupt lengths), one md5 per row, unhex to 90 bytes
      expr("unhex(substring(repeat(md5(concat('v:', cast(id as string))), 6), 1, 180))")
        .as("value"))

  /** Total-order sort by the binary key (unsigned byte order — Spark's
    * BinaryType ordering matches BytesWritable's comparator).
    */
  def teraSort(records: DataFrame, partitions: Int): DataFrame =
    records.repartitionByRange(partitions, col("key"))
      .sortWithinPartitions(col("key"))

  /** Order-independent checksum: XOR of per-record digests — invariant
    * under any shuffle/sort, so checksum(gen) == checksum(sorted) iff no
    * record was lost or corrupted (the SortValidator.java:97-168 idea).
    * xxhash64 stays inside whole-stage codegen (md5-over-hex was ~10× the
    * per-record cost for the same lossless-pipeline evidence).
    */
  def teraChecksum(records: DataFrame): Long =
    records.select(expr("bit_xor(xxhash64(key, value))").as("cs"))
      .head().getLong(0)

  final case class PartitionReport(part: Int, count: Long, sorted: Boolean,
                                   first: Array[Byte], last: Array[Byte],
                                   xor: Long)

  /** TeraValidate: every partition internally sorted, partition key
    * ranges non-overlapping, and total count preserved. One pass, no
    * driver-side data movement beyond one row per partition. Reports are
    * ordered by first key, not partition index, so the check also holds
    * for range-partitioned output read back from disk where the scan may
    * enumerate files in any order (the reference orders by file name,
    * TeraValidate.java:53-88; name order == range order by construction
    * of the writer).
    */
  def teraValidate(sorted: DataFrame): (Boolean, Long) = {
    val (ok, count, _) = teraValidateChecksum(sorted)
    (ok, count)
  }

  /** Validation + checksum fused into ONE scan (the reference runs
    * TeraValidate and TeraChecksum as two jobs = two full reads).
    */
  def teraValidateChecksum(sorted: DataFrame): (Boolean, Long, Long) = {
    val reports = sorted
      .select(col("key"), expr("xxhash64(key, value)").as("h"))
      // InternalRow scan (getBinary copies the key bytes out of the
      // reused UnsafeRow buffer, so holding first/last refs is safe)
      .queryExecution.toRdd.mapPartitionsWithIndex { (idx, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          var first: Array[Byte] = null
          var last: Array[Byte] = null
          var count = 0L
          var ok = true
          var xor = 0L
          while (it.hasNext) {
            val r = it.next()
            val k = r.getBinary(0)
            if (first == null) first = k
            if (last != null && JArrays.compareUnsigned(last, k) > 0) ok = false
            last = k
            count += 1
            xor ^= r.getLong(1)
          }
          Iterator(PartitionReport(idx, count, ok, first, last, xor))
        }
      }.collect().sortWith((a, b) => JArrays.compareUnsigned(a.first, b.first) < 0)
    val locallySorted = reports.forall(_.sorted)
    val boundariesOk = reports.sliding(2).forall {
      case Array(a, b) => JArrays.compareUnsigned(a.last, b.first) <= 0
      case _           => true
    }
    (locallySorted && boundariesOk, reports.map(_.count).sum,
      reports.map(_.xor).foldLeft(0L)(_ ^ _))
  }
}
