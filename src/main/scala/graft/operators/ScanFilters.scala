package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Scan-time row filters and bad-record skipping.
  *
  * Reference: SequenceFileInputFilter (mapreduce/lib/input/
  * SequenceFileInputFilter.java:49) with RegexFilter (:110),
  * PercentFilter (:153 — every Nth record by digest) and MD5Filter
  * (:202 — digest-mod-f sampling); SkipBadRecords
  * (mapred/SkipBadRecords.java:55,269,308) binary-searches around
  * crashing records.
  *
  * Spark-first: the filters are ordinary predicates (pushed into the
  * scan where the source supports it); deterministic digest sampling
  * uses md5 of the key so the SAME rows are selected on every engine
  * and run — unlike `sample()`, which is seed- and partitioning-
  * dependent. Bad-record skipping needs no binary search: the failing
  * record is caught exactly, counted, and side-channeled.
  */
object ScanFilters {

  /** RegexFilter: keep rows whose key matches. */
  def regexFilter(df: DataFrame, key: Column, pattern: String): DataFrame =
    df.filter(key.rlike(pattern))

  /** MD5Filter: deterministic 1-in-f digest sampling. */
  def digestSample(df: DataFrame, key: Column, f: Int): DataFrame =
    df.filter(expr_mod(key, f) === 0)

  private def expr_mod(key: Column, f: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % f

  /** SkipBadRecords: run `f` per row; rows that throw are dropped and
    * counted in the returned accumulator (the reference's skip-mode
    * side output). The DROP is exact and retry-safe; the COUNT is not:
    * accumulators updated inside a transformation can double-count under
    * task retry/speculation (exactly-once holds only for accumulator
    * updates in actions). Treat the counter as diagnostic — for an
    * exactly-once skip metric, `observe` a count on the output Dataset
    * (Counters.scala) instead.
    */
  def skipBad[T](df: DataFrame, name: String)(f: Row => T)(
      implicit enc: org.apache.spark.sql.Encoder[T]): (org.apache.spark.sql.Dataset[T], LongAccumulator) = {
    val acc = df.sparkSession.sparkContext.longAccumulator(name)
    val out = df.mapPartitions { it =>
      it.flatMap { row =>
        try Iterator.single(f(row))
        catch { case _: Exception => acc.add(1); Iterator.empty }
      }
    }
    (out, acc)
  }
}
