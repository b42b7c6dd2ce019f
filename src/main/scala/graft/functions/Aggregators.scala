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
    * min(#distinct, cap). The reference caps *arbitrary* values (its
    * state is a TreeMap keyed by the value's string form), hence the type
    * parameter — [[cappedDistinct]] is the long lane, [[cappedDistinctString]]
    * the faithful string lane. The bounded buffer makes the aggregation
    * safe on skewed keys at scale: state is O(cap) per group, never
    * O(#distinct). merge() fills from the other set until the cap, which
    * preserves size = min(cap, |A ∪ B|) — the reported count is
    * deterministic even though the retained sample is partition-order
    * dependent.
    */
  case class CappedDistinct[T](cap: Int)
      extends Aggregator[T, mutable.HashSet[T], Long] {
    def zero: mutable.HashSet[T] = mutable.HashSet.empty
    def reduce(b: mutable.HashSet[T], a: T): mutable.HashSet[T] = {
      if (b.size < cap) b += a
      b
    }
    def merge(a: mutable.HashSet[T], b: mutable.HashSet[T]): mutable.HashSet[T] = {
      val it = b.iterator
      while (a.size < cap && it.hasNext) a += it.next()
      a
    }
    def finish(r: mutable.HashSet[T]): Long = r.size.toLong
    def bufferEncoder: Encoder[mutable.HashSet[T]] = Encoders.kryo
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: capped distinct over a long column. */
  def cappedDistinct(c: Column, cap: Int): Column =
    udaf(CappedDistinct[Long](cap), Encoders.scalaLong).apply(c)

  /** Column form: capped distinct over a string column — the reference's
    * common case (UniqValueCount stringifies every value).
    */
  def cappedDistinctString(c: Column, cap: Int): Column =
    udaf(CappedDistinct[String](cap), Encoders.STRING).apply(c)

  /** ValueHistogram report (mapreduce/lib/aggregate/ValueHistogram.java:38-120):
    * per key, the frequency table of values summarized as
    * (uniqueCount, min, median, max, mean, stddev) of the per-value counts.
    *
    * Two forms exist: EventQueries."value_histogram" composes two hash
    * aggregations (preferred — both levels get map-side combine and
    * codegen), and [[ValueHistogram]] below is the single-call Aggregator
    * for callers that need the report as one column. State is the
    * value→count map, so memory is O(#distinct values per group) — same
    * bound as the reference's in-reducer TreeMap.
    */
  final case class HistogramReport(uniqueCount: Long, minCount: Long,
                                   medianCount: Double, maxCount: Long,
                                   meanCount: Double, stddevCount: Double)

  case class ValueHistogram[T]()
      extends Aggregator[T, mutable.HashMap[T, Long], HistogramReport] {
    def zero: mutable.HashMap[T, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[T, Long], a: T): mutable.HashMap[T, Long] = {
      b.update(a, b.getOrElse(a, 0L) + 1L); b
    }
    def merge(a: mutable.HashMap[T, Long], b: mutable.HashMap[T, Long]): mutable.HashMap[T, Long] = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
      a
    }
    def finish(m: mutable.HashMap[T, Long]): HistogramReport = {
      val counts = m.values.toArray.sorted
      val n = counts.length
      if (n == 0) return HistogramReport(0, 0, 0.0, 0, 0.0, 0.0)
      val s = counts.sum
      val ss = counts.map(c => c * c).sum
      // interpolated median, matching SQL median()/percentile(0.5)
      val median =
        if (n % 2 == 1) counts(n / 2).toDouble
        else (counts(n / 2 - 1) + counts(n / 2)) / 2.0
      HistogramReport(n.toLong, counts.head, median, counts.last,
        s.toDouble / n, math.sqrt((ss - s.toDouble * s / n) / n))
    }
    def bufferEncoder: Encoder[mutable.HashMap[T, Long]] = Encoders.kryo
    def outputEncoder: Encoder[HistogramReport] = Encoders.product[HistogramReport]
  }

  /** Column form: histogram report over a long-valued column. */
  def valueHistogram(c: Column): Column =
    udaf(ValueHistogram[Long]()).apply(c)

  /** Bounded top-k by (score desc, id asc) — the scalable replacement
    * for `row_number() OVER (PARTITION BY key ORDER BY score)`: the
    * window plan lands a key's ENTIRE candidate list on one task, while
    * this Aggregator's map-side partial keeps at most k rows per
    * (partition, key) so the shuffle carries k·numPartitions candidates
    * per key instead of the full |base|. State is O(k); the total order
    * (-score, id) makes reduce/merge order-independent, so results are
    * deterministic and tie-stable.
    */
  case class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Vector[(Double, Long)], Seq[Long]] {
    private def worse(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
    def zero: Vector[(Double, Long)] = Vector.empty
    def reduce(b: Vector[(Double, Long)], a: (Double, Long)): Vector[(Double, Long)] =
      if (b.length >= k && worse(a, b.last)) b       // O(1) reject path
      else {
        // an id may recur (e.g. IVF rep>1): keep its BEST score, so the
        // retained entry doesn't depend on encounter order (merge already
        // does this via sort-then-distinctBy)
        val i = b.indexWhere(_._2 == a._2)
        if (i < 0) (b :+ a).sortWith((x, y) => worse(y, x)).take(k)
        else if (worse(b(i), a)) b.updated(i, a).sortWith((x, y) => worse(y, x))
        else b
      }
    def merge(a: Vector[(Double, Long)], b: Vector[(Double, Long)]): Vector[(Double, Long)] =
      (a ++ b).sortWith((x, y) => worse(y, x)).distinctBy(_._2).take(k)
    def finish(r: Vector[(Double, Long)]): Seq[Long] = r.map(_._2)
    def bufferEncoder: Encoder[Vector[(Double, Long)]] = Encoders.kryo
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: ids of the top-k scores, best first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    udaf(TopKByScore(k)).apply(score, id)
}
