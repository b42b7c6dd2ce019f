package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketches — the beyond-cap scale lane of
  * the reference's UniqValueCount (mapreduce/lib/aggregate/
  * UniqValueCount.java:35-95). The reference bounds per-group state by
  * silently truncating at a cap (the uniq_cap queries reproduce that
  * contract bit-for-bit); a 100 TB corpus instead wants a FIXED-size
  * mergeable summary whose estimate keeps improving: a 2^lgK-register
  * HLL sketch (Spark's built-in Apache DataSketches lane, codegen'd
  * `hll_sketch_agg`).
  *
  * The property that matters at scale is MERGEABILITY: sketches built
  * per shard/day/partition union into a summary of the whole, so
  * distinct counts compose incrementally — per-day sketches roll up to
  * month/alltime without touching raw data, the pattern every
  * dedup/reach dashboard needs. The union is deterministic but not
  * register-identical to a single pass (DataSketches promotes
  * sparse-mode sketches differently under union), so BOTH lanes carry
  * the same ~1.04/sqrt(2^lgK) error bound (≈1.6% at the default
  * lgK=12) and agree with each other to within it — spec'd, along with
  * rerun determinism, in OperatorSpec.
  *
  * This completes the library's three sketch families, all one-pass,
  * fixed-size, mergeable: Bloom (set MEMBERSHIP — decontaminate_bloom),
  * Count-Min (frequency ESTIMATION — rare_token_sketch), HLL (distinct
  * CARDINALITY — uniq_hll).
  */
object Sketches {

  /** One HLL sketch per group: (groupCols*, sketch binary). */
  def distinctSketch(df: DataFrame, value: Column, lgK: Int,
                     groupCols: String*): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("sketch"))

  /** Merge per-subgroup sketches up one grouping level and estimate:
    * the incremental-rollup shape (e.g. per-(type, day) sketches →
    * per-type distinct). Input must carry a `sketch` column from
    * [[distinctSketch]].
    */
  def mergeEstimate(sketches: DataFrame, groupCols: String*): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("uniq_est"))

  /** Single-pass per-group distinct estimate (the non-incremental
    * form; identical result to sketch-then-merge by HLL merge algebra).
    */
  def distinctEstimate(df: DataFrame, value: Column, lgK: Int,
                       groupCols: String*): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(value, lit(lgK))).as("uniq_est"))
}
