package graft.jobs

import org.apache.spark.sql.SparkSession

/** Bailey–Borwein–Plouffe hex digits of π.
  *
  * Reference: BaileyBorweinPlouffe.java (hadoop-mapreduce-examples,
  * :1-646) — each map task extracts an independent range of hexadecimal
  * digits with the BBP spigot formula
  * π = Σ 16^-k (4/(8k+1) − 2/(8k+4) − 1/(8k+5) − 1/(8k+6)),
  * using modular exponentiation so digit d needs no digits before it.
  * Spark-first: digits are a `spark.range` mapped per element —
  * embarrassingly parallel, no shuffle, one concat at the driver (the
  * reference's single reducer).
  */
object Bbp {

  private def modPow16(e: Long, m: Long): Long =
    BigInt(16).modPow(e, m).toLong

  /** Fractional part of 16^d · Σ_k 1/(16^k (8k+j)). */
  private def series(j: Int, d: Long): Double = {
    var s = 0.0
    var k = 0L
    while (k <= d) {
      s += modPow16(d - k, 8 * k + j).toDouble / (8 * k + j)
      s -= math.floor(s)
      k += 1
    }
    var t = 0.0
    var num = 1.0 / 16
    k = d + 1
    while (num / (8 * k + j) > 1e-17) {
      t += num / (8 * k + j)
      num /= 16
      k += 1
    }
    val x = s + t
    x - math.floor(x)
  }

  /** The d-th hex digit of π after the point (0-based). */
  def hexDigit(d: Long): Int = {
    val x = 4 * series(1, d) - 2 * series(4, d) - series(5, d) - series(6, d)
    val f = x - math.floor(x) + 1.0
    ((f - math.floor(f)) * 16).toInt
  }

  /** `count` hex digits starting at `start`, computed distributed. */
  def hexDigits(spark: SparkSession, start: Long, count: Int,
                partitions: Int = 32): String = {
    import spark.implicits._
    spark.range(start, start + count, 1, partitions)
      .map(d => (d, Bbp.hexDigit(d)))
      .collect().sortBy(_._1)
      .map { case (_, digit) => "%X".format(digit) }.mkString
  }
}
