package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles by value-counting — the corpus-statistics
  * primitive behind length histograms, truncation-threshold picks and
  * per-source length-distribution dashboards (the reference's histogram
  * reporting lane, mapreduce/lib/aggregate/ValueHistogram.java:38-120,
  * stops at min/median/max of value COUNTS; a curation pipeline needs
  * arbitrary percentiles of the VALUES).
  *
  * Why not sort-based quantiles: a global sort of a 100 TB metric column
  * shuffles every row. Integer metrics (token counts, line counts, byte
  * sizes, scores on a fixed grid) have BOUNDED VALUE CARDINALITY, so the
  * exact distribution is recoverable from a (group, value) -> count
  * table: count per value (one partial-aggregated shuffle of the
  * value-count pairs, never the rows), then a cumulative walk over the
  * per-group distribution — the window runs over #distinct-values rows
  * per group, not #rows. The result is EXACT (quantile_disc semantics:
  * the smallest value whose cumulative count reaches ceil(q·n)), fully
  * SQL-replayable, and insensitive to partitioning.
  *
  * Continuous doubles first quantize to a grid (pick the grid from the
  * precision the decision needs — a drop-threshold never needs more than
  * a few thousand distinct cells); the integer lane here is then exact
  * over the quantized value, the same fixed-point discipline as the
  * rest of the library.
  */
object Quantiles {

  /** Exact per-group percentiles of an integral metric.
    *
    * Output: one row per (group, pct): the smallest `v` with
    * cumCount(v) >= ceil(n * pct / 100) — DuckDB's `quantile_disc`
    * lower-value convention, replayed oracle-side with the identical
    * integer arithmetic (no float targets: `(n*pct + 99) div 100`).
    *
    * Plan shape (pinned in PlanSpec): partial+final aggregate to the
    * value-count table, then one hash-partitioned window per group over
    * that bounded table. The percentile fan-out (`explode`) happens
    * AFTER the aggregation, on #distinct-values rows.
    */
  /** The rank rule shared by the distributed lane and the streaming
    * value-count state ([[graft.streaming.StreamingOps
    * .runningPercentiles]]): smallest value whose cumulative count
    * reaches ceil(n·pct/100), over (value -> count) pairs.
    */
  private[graft] def localPercentile(counts: Iterable[(Long, Long)],
                                     pct: Int): Long = {
    val sorted = counts.toSeq.sortBy(_._1)
    val n = sorted.iterator.map(_._2).sum
    val target = (n * pct + 99) / 100
    var cum = 0L
    sorted.find { case (_, c) => cum += c; cum >= target }
      .getOrElse(throw new IllegalArgumentException("empty distribution"))._1
  }

  def exactPercentiles(df: DataFrame, groupCol: String, value: Column,
                       pcts: Seq[Int]): DataFrame =
    exactWeightedPercentiles(df, groupCol, value, lit(1L), pcts)

  /** WEIGHTED exact percentiles: the smallest value whose cumulative
    * WEIGHT reaches ceil(totalWeight · pct / 100). With weight = token
    * count and value = document length, the p50 answers "what length
    * covers half the corpus's token mass" — the budgeting/packing
    * statistic (unweighted percentiles over-represent short docs).
    * Weights must be non-negative integers — ENFORCED at runtime (a
    * negative weight makes the cumulative sums non-monotonic, so the
    * (cum-cnt, cum] range filter silently returns zero or duplicate
    * rows per (group, pct); failing loud inside the aggregate beats a
    * wrong percentile). Same value-count scale shape as the unweighted
    * lane.
    */
  def exactWeightedPercentiles(df: DataFrame, groupCol: String,
                               value: Column, weight: Column,
                               pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    require(pcts.distinct.size == pcts.size, "duplicate percentile")
    // guard the ORIGINAL column, before the long cast: casting first
    // would truncate -0.5 to 0 (guard never fires) and 2.7 to 2
    // (silently wrong weighted ranks). Integrality = the value survives
    // the long round trip. Lives INSIDE the summed expression so it
    // cannot be pruned.
    val wOk = weight.isNull ||
      (weight >= 0 &&
        weight.cast("double") === weight.cast("long").cast("double"))
    val wChecked = when(wOk, weight.cast("long")).otherwise(raise_error(concat(
      lit("exactWeightedPercentiles: weight must be a non-negative integer, got "),
      weight.cast("string"))).cast("long"))
    val vc = df.groupBy(col(groupCol), value.cast("long").as("v"))
      .agg(sum(wChecked).as("cnt"))
      .filter(col("cnt") > 0)
    val byGroup = Window.partitionBy(groupCol)
    val cum = vc
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy("v")))
      .withColumn("n", sum(col("cnt")).over(byGroup))
    // the row whose cumulative range (cum-cnt, cum] contains the target
    // rank is unique per (group, pct): a filter selects it exactly
    cum.select(col(groupCol), col("v"), col("cnt"), col("cum"), col("n"),
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct"))
      .withColumn("target", expr("(n * pct + 99) div 100"))
      .filter(col("cum") >= col("target") &&
        col("cum") - col("cnt") < col("target"))
      .select(col(groupCol), col("pct"), col("v").as("val"))
  }

  // ---- log-histogram quantile sketch (unbounded-cardinality metrics) --

  /** Log-histogram bucket id of a NON-NEGATIVE integral metric — the
    * DDSketch idea (relative-error quantiles from a log-binned
    * histogram) made DETERMINISTIC and engine-portable by integer-only
    * binning: no float `log` whose last-bit rounding could disagree
    * between engines at a bucket boundary.
    *
    *  - x in [0, 16): id = x (the exact small-value lane)
    *  - x >= 16:      id = (l-4)*16 + (x >> (l-4)), l = floor(log2 x)
    *                  computed as length(bin(x)) - 1 — 16 sub-buckets
    *                  per octave, so bucket width / lower bound <= 1/16
    *
    * Monotone in x, total bucket count <= 16·60 + 16 for any long, and
    * every step (bin-string length, shifts) is exact integer arithmetic
    * a SQL oracle replays byte-for-byte. Negative input raises (sizes
    * and counts are the domain; silently bucketing a negative would
    * return a wrong quantile).
    */
  def logBucket(c: Column): Column = {
    val x = c.cast("long")
    val l = (length(bin(x)) - 1).cast("int")
    when(x < 0, raise_error(concat(lit("logBucket: negative value "),
        x.cast("string"))).cast("long"))
      .when(x < 16, x)
      // call_function: the functions.shiftright overload takes a static
      // Int, but the shift amount here is per-row
      .otherwise(((l - 4) * 16).cast("long") +
        call_function("shiftright", x, l - 4))
  }

  /** Lower bound of bucket `id` — the deterministic quantile estimate
    * (true value lies in [low, low·17/16) for the big lane; exact in
    * the small lane).
    */
  def bucketLow(id: Column): Column = {
    val q = (id / 16).cast("int") // id >= 16 ⇒ octave index + 1
    when(id < 16, id)
      .otherwise(call_function("shiftleft",
        id - ((q - 1) * 16).cast("long"), q - 1))
  }

  /** Per-group quantile ESTIMATES of an unbounded-cardinality
    * non-negative metric (byte sizes, latencies, char counts — anything
    * whose distinct-value count would blow up [[exactPercentiles]]'s
    * value-count state). Same rank rule as the exact lane, walked over
    * the log-histogram: the answer is the LOWER BOUND of the bucket
    * containing the true percentile, so
    * `est <= true < est·(1 + 1/16)` (exact below 16).
    *
    * The histogram is a (group, bucket) -> count table — bounded at
    * ~976 buckets per group for any long — and MERGEABLE by plain
    * count addition (shards, snapshots, streaming micro-batches: the
    * HLL-rollup discipline). Composing [[logBucket]] with the
    * streaming value-count state ([[graft.streaming.StreamingOps
    * .runningPercentiles]]) bounds its per-key state the same way.
    */
  def logHistQuantiles(df: DataFrame, groupCol: String, value: Column,
                       pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    require(pcts.distinct.size == pcts.size, "duplicate percentile")
    val vc = df.groupBy(col(groupCol), logBucket(value).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val byGroup = Window.partitionBy(groupCol)
    val cum = vc
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy("b")))
      .withColumn("n", sum(col("cnt")).over(byGroup))
    cum.select(col(groupCol), col("b"), col("cnt"), col("cum"), col("n"),
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct"))
      .withColumn("target", expr("(n * pct + 99) div 100"))
      .filter(col("cum") >= col("target") &&
        col("cum") - col("cnt") < col("target"))
      .select(col(groupCol), col("pct"), bucketLow(col("b")).as("est"))
  }
}
