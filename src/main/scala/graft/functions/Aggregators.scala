package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregators mirroring the reference's ValueAggregator plugins
  * (mapreduce/lib/aggregate/ValueAggregatorBaseDescriptor.java:39-117).
  * Sum/min/max map to built-ins; the two with bespoke semantics live here.
  */
object Aggregators {

  /** Capped exact-distinct count.
    *
    * Reference: UniqValueCount (mapreduce/lib/aggregate/UniqValueCount.java:35-95)
    * stops inserting once the set reaches
    * `mapreduce.aggregate.max.num.unique.values`, so its report is
    * min(#distinct, cap). The bounded buffer makes the aggregation safe on
    * skewed keys at scale: state is O(cap) per group, never O(#distinct).
    * merge() fills from the other set until the cap, which preserves
    * size = min(cap, |A ∪ B|) — the reported count is deterministic even
    * though the retained sample is partition-order dependent.
    */
  case class CappedDistinct(cap: Int)
      extends Aggregator[Long, mutable.HashSet[Long], Long] {
    def zero: mutable.HashSet[Long] = mutable.HashSet.empty
    def reduce(b: mutable.HashSet[Long], a: Long): mutable.HashSet[Long] = {
      if (b.size < cap) b += a
      b
    }
    def merge(a: mutable.HashSet[Long], b: mutable.HashSet[Long]): mutable.HashSet[Long] = {
      val it = b.iterator
      while (a.size < cap && it.hasNext) a += it.next()
      a
    }
    def finish(r: mutable.HashSet[Long]): Long = r.size.toLong
    def bufferEncoder: Encoder[mutable.HashSet[Long]] = Encoders.kryo
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: capped distinct over a long column. */
  def cappedDistinct(c: Column, cap: Int): Column =
    udaf(CappedDistinct(cap)).apply(c)

  /** ValueHistogram report (mapreduce/lib/aggregate/ValueHistogram.java:38-120):
    * per key, the frequency table of values summarized as
    * (uniqueCount, min, median, max, mean, stddev) of the per-value counts.
    * Composed from two hash aggregations rather than one opaque UDAF so
    * both levels get map-side partial aggregation and codegen; see
    * EventQueries."value_histogram" for the query form.
    */
}
