package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering of rows into
  * files so that min/max footer stats prune scans on EVERY clustered
  * column, not just the sort-leading one (the Delta/Iceberg OPTIMIZE
  * ZORDER capability, re-expressed as plain Spark range partitioning
  * over an interleaved key).
  *
  * Scale rationale: at 100 TB the dominant cost of a selective query is
  * how many files its predicate touches. A lexicographic sort clusters
  * only its first column; bit-interleaving k quantized columns gives
  * every column ~bits/k leading bits of locality, so a predicate on ANY
  * clustered column skips most files. The z-value is a pure row-local
  * expression (shifts/ands/ors — whole-stage codegen), the layout is
  * one `repartitionByRange` + in-partition sort: exactly the shuffle
  * a global sort would pay, no more.
  *
  * Everything here is deterministic given the quantization bounds: the
  * z-value kernel is replayable bit-for-bit in SQL (the declared
  * `zorder_key` query's DuckDB oracle replays the interleave as a sum
  * of shifted bit terms).
  */
object Layout {

  /** Morton (z-order) interleave of `cols`, each contributing its low
    * `bits` bits: bit j of cols(c) lands at position j * cols.size + c
    * (column 0 owns the least-significant lane). Inputs are masked to
    * `bits` — callers quantize first ([[quantizeLinear]] or any
    * bounded integer rank); the monotonicity-per-coordinate property
    * holds only within the masked range. cols.size * bits must fit a
    * signed long (<= 62 keeps every z-value non-negative).
    */
  def zvalue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(bits >= 1 && cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits exceed a non-negative long")
    val k = cols.size
    val mask = lit((1L << bits) - 1)
    val lanes = for {
      (c, ci) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long").bitwiseAND(mask), j).bitwiseAND(lit(1L)),
      j * k + ci)
    lanes.reduce(_ bitwiseOR _)
  }

  /** Linear quantization of `c` onto [0, 2^bits) given CLOSED bounds
    * [lo, hi] — the bounded-artifact pattern: callers compute lo/hi
    * with one min/max aggregation (two longs to the driver) and bake
    * them in, so the quantizer itself is row-local and replayable.
    * Out-of-range values clamp; hi == lo maps everything to 0.
    */
  def quantizeLinear(c: Column, lo: Long, hi: Long, bits: Int = 16): Column = {
    require(hi >= lo, s"bad bounds [$lo, $hi]")
    val span = math.max(hi - lo, 1L)
    val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi))
    // floor((v - lo) * maxCode / span), maxCode = 2^bits - 1, exact:
    // the product rides decimal(38,0) (a long span times a 16-bit code
    // overflows a long), and floor-of-decimal-division is safe because
    // Spark's division scale (21 digits here) rounds at 1e-21 while the
    // quotient sits at least 1/span > 1e-19 away from any integer — the
    // rounding can never cross the floor boundary the oracle's integer
    // `//` computes.
    val maxCode = (1L << bits) - 1
    floor((clamped - lit(lo)).cast("decimal(38,0)") * lit(maxCode)
      / lit(span)).cast("long")
  }

  /** Cluster `df` into `numPartitions` z-ordered ranges: rows whose
    * quantized `cols` are close in EVERY dimension land in the same or
    * adjacent partition, so a parquet write of the result yields files
    * whose per-column min/max ranges are narrow on all `cols` at once.
    * The in-partition sort keeps row groups within a file clustered
    * too (row-group-level stats pruning).
    */
  def zorderBy(df: DataFrame, numPartitions: Int, bits: Int,
               cols: Column*): DataFrame = {
    val z = zvalue(cols, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
