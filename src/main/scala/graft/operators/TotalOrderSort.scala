package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Cluster-wide total-order sort.
  *
  * Reference: the Sort example wires RandomSampler → TotalOrderPartitioner
  * → identity M/R (examples/Sort.java:92-166,
  * mapreduce/lib/partition/TotalOrderPartitioner.java:102-412,
  * InputSampler.java:97-314). Spark's `RangePartitioner` already samples
  * split points internally, so the idiomatic form is
  * `repartitionByRange(n).sortWithinPartitions(...)`: partition i holds
  * keys <= partition i+1's, each partition locally sorted — exactly the
  * reference's output contract (globally ordered across part files),
  * with NO single-node bottleneck at any scale.
  */
object TotalOrderSort {

  def sorted(df: DataFrame, numPartitions: Int, keys: Column*): DataFrame =
    df.repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)

  /** Sort by computed key expressions, materializing them first.
    *
    * Spark's sort comparator re-evaluates non-attribute SortOrder
    * expressions on EVERY comparison — a regex-split key turns an
    * O(n log n) sort into O(n log n) regex evaluations (measured 4x+
    * slowdown). Projecting keys into temp columns makes the comparator
    * a plain attribute compare; the temp columns are dropped after.
    * `keys` pairs a key expression with its descending flag.
    */
  def withRankKeyed(df: DataFrame, numPartitions: Int, rankCol: String,
                    keys: Seq[(Column, Boolean)]): DataFrame = {
    val named = keys.zipWithIndex.map { case ((c, _), i) => c.as(s"__sk$i") }
    val sortCols = keys.zipWithIndex.map { case ((_, desc), i) =>
      if (desc) col(s"__sk$i").desc else col(s"__sk$i").asc
    }
    val wide = df.select(col("*") +: named: _*)
    withRank(wide, numPartitions, rankCol, sortCols: _*)
      .drop(keys.indices.map(i => s"__sk$i"): _*)
  }

  /** Totally-sorted rows with a 1-based global rank column.
    *
    * `zipWithIndex` after a range-partitioned local sort assigns
    * contiguous, partition-ordered indices with one lightweight job to
    * count partition sizes — no global single-partition window (which
    * would be the naive `row_number() OVER (ORDER BY ...)` plan and a
    * scale bottleneck). `keys` must be a total order (add tiebreakers)
    * or ranks of ties are unspecified.
    *
    * Why RDD `zipWithIndex` and not a pure-DataFrame rank: its two jobs
    * share ONE RDD lineage, so the count job materializes the sort
    * shuffle and the map job skips straight to reading those shuffle
    * files — the sort is paid once. A DataFrame-level offsets pass
    * (persist sorted frame → count per partition → rank projection)
    * re-plans per action, so it must cache the sorted frame to avoid
    * sorting twice; the columnar cache build measured ~2x the rank
    * stage's entire Row-codec cost at sf0.1 (keyfield_sort 3.4s →
    * 5.3s+). The Row round-trip here is the cheaper toll.
    */
  def withRank(df: DataFrame, numPartitions: Int, rankCol: String, keys: Column*): DataFrame = {
    val s = sorted(df, numPartitions, keys: _*)
    val schema = s.schema.add(rankCol, LongType, nullable = false)
    val rdd = s.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
