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

  // ---- the ENGINE-PORTABLE HLL ------------------------------------
  //
  // The DataSketches lane above is the production sketch (codegen'd,
  // battle-tested) but its hash and estimator are implementation
  // internals — rows-only at the oracle. THIS variant trades a little
  // speed for full cross-engine replayability, the kmeansCodebook
  // move applied to cardinality sketches: registers come from the
  // md5 60-bit hash (bucket = top 12 bits, rho = leading-zero run of
  // the low 48 bits + 1 — 49 − length-of-binary, no float log),
  // register merge is element-wise MAX (EXACT merge algebra:
  // merge-of-sketches ≡ sketch-of-union bit-for-bit, with none of
  // DataSketches' sparse-mode promotion divergence), and the
  // estimator's register sum Σ 2^(49−M_j) is an EXACT integer (every
  // term a power of two ≤ 2^49; 4096 terms < 2^62), so the only float
  // steps are one shared-order constant expression, one division and
  // the small-range ln — each a single correctly-rounded IEEE op a
  // SQL engine reproduces double-for-double (the DSIR ln-parity
  // precedent).
  //
  // REPRESENTATION: the sketch is a narrow REGISTER TABLE
  // (groupCols*, b, m) — ≤ 4096 rows per group — not a per-row array
  // buffer. Everything is then a codegen'd two-phase HashAggregate
  // (build = max(rho) per (group, bucket); merge = max(m) again;
  // estimate = one integer sum), which both matches the oracle's own
  // relational shape AND avoids the typed-Aggregator big-buffer trap:
  // a 4 KB array buffer serialized per input row measured 14× slower
  // than this form on the fixture.

  // P is FROZEN at 12: the oracle SQL (EventQueries' uniq_hll_portable
  // replay) spells the derived constants out as literals, so changing
  // PortableP here without regenerating the oracle would silently
  // desync registers, estimator and replay. Everything below therefore
  // DERIVES from PortableP/PortableM — one edit point, and the
  // companion literals are named so the oracle's numbers are greppable:
  //   PortableW      = 48   (hash bits feeding rho = 60 − P)
  //   PortableRhoMax = 49   (W + 1)
  //   PortableEmpty  = 2^49 (an empty register's estimator term)
  val PortableP = 12
  val PortableM = 1 << PortableP                    // 4096 registers
  private val PortableW = 60 - PortableP            // 48 low hash bits
  private val PortableRhoMax = PortableW + 1        // 49
  private val PortableEmpty = 1L << PortableRhoMax  // 2^49 = 562949953421312

  /** bucket/rho projections from a 60-bit h1-style hash column — the
    * registers' law, identical text to the oracle's.
    */
  private def bucketOf(h: Column): Column = shiftrightunsigned(h, PortableW)
  private def rhoOf(h: Column): Column = {
    val low = h.bitwiseAND(lit((1L << PortableW) - 1L))
    when(low === 0L, lit(PortableRhoMax))
      .otherwise(lit(PortableRhoMax) - length(bin(low)))
  }

  /** One portable sketch per group as a register table:
    * (groupCols*, b, m) with m = max rho per bucket — ≤ 4096 narrow
    * rows per group, built by one map-side-combined aggregation.
    * `value` is hashed with the h1 discipline (md5 of its string
    * form, first 15 hex digits).
    */
  def portableRegisters(df: DataFrame, value: Column,
                        groupCols: String*): DataFrame = {
    val h = Dedup.h1(value.cast("string"))
    df.select((groupCols.map(col) :+ bucketOf(h).as("b") :+
        rhoOf(h).as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("b")): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** Merge register tables up one grouping level — max per bucket,
    * the exact merge. */
  def portableMergeRegisters(regs: DataFrame, groupCols: String*): DataFrame =
    regs.groupBy((groupCols.map(col) :+ col("b")): _*)
      .agg(max(col("m")).as("m"))

  /** (groupCols*, s, v) from a register table: s = Σ 2^(49−M_j) over
    * present buckets plus 2^49 per empty bucket — an exact BIGINT, the
    * estimator's denominator — and v = empty-register count. Both
    * exact integers, the hash-checkable core of the estimate.
    */
  def portableSv(regs: DataFrame, groupCols: String*): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        (expr(s"sum(shiftleft(1L, $PortableRhoMax - m))") +
          (lit(PortableM.toLong) - count(lit(1))) * lit(PortableEmpty))
          .cast("long").as("s"),
        (lit(PortableM.toLong) - count(lit(1))).cast("long").as("v"))

  /** The estimate from (s, v): alpha·m²·2⁴⁹ / s with the standard
    * small-range linear-counting correction. The constant expression
    * is written in the SAME op order as the SQL oracle, so both
    * engines produce the identical double before the one division.
    * The linear-counting ln goes through [[graft.functions.IeeeLn]]
    * (platform Math.log == the oracle's std::log): Spark's builtin
    * `log` is fdlibm StrictMath.log, one ulp off on ~1% of inputs —
    * the current fixture's m/v values happened to avoid the divergent
    * set, but that was luck, not a contract (the multimodal_entropy
    * lane DID hit it; see MathExpressions).
    */
  def portableEstimate(s: Column, v: Column): Column = {
    val m = PortableM.toDouble                            // 4096.0
    val c = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m)) *
      lit(m) * lit(m) * lit(PortableEmpty.toDouble)       // 2^49
    val raw = c / s.cast("double")
    when(raw <= lit(2.5 * m) && v > 0,                    // 10240.0
      lit(m) * graft.functions.MathExpressions.ieee_ln(
        lit(m) / v.cast("double"))).otherwise(raw)
  }
}
