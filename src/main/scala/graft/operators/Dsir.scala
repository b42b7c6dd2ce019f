package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023 — DSIR):
  * score every raw document by how much its hashed-n-gram distribution
  * looks like a curated target corpus, log w(x) = Σ_tokens
  * (ln p̂_target(bucket) − ln p̂_raw(bucket)) under add-one-smoothed
  * bag-of-hashed-unigram models. The modern curation step between
  * rule filters (Gopher/C4) and model classifiers (Classify): pick
  * raw-crawl documents that are DISTRIBUTIONALLY like the target.
  *
  * Scale extension — no reference counterpart (SURVEY §7.5).
  *
  * Determinism contract: the two bucket-count tables are exact integer
  * aggregates; each bucket's log-ratio is computed ONCE on the driver
  * and rounded to a FIXED-POINT long (1e-6 units, half away from
  * zero), so per-document scores are exact integer sums of λ values —
  * order-independent, partitioning-invariant, and replayable by the
  * DuckDB oracle (which recomputes λ from the same counts; `ln` is the
  * only float step and it happens once per bucket pre-rounding, never
  * in the per-token accumulation — the [[TextOps.perplexity]] lesson).
  *
  * Scale shape: counting is one map-side-combined aggregation per
  * corpus shuffling (bucket, count) rows — at most `b` per partition;
  * λ is a length-`b` long array (kilobytes — THE model artifact: train
  * once, persist, broadcast per batch); scoring is row-local (hash,
  * index, sum — no join, no shuffle of text). The hashing trick bounds
  * the model size regardless of vocabulary (the [[Classify]]
  * `hashBuckets` discipline), at the cost of collision noise the DSIR
  * paper accepts by construction.
  */
object Dsir {

  /** A token's hash bucket: the shared 60-bit md5 recipe ([[Dedup.h1]])
    * mod `b` — non-negative, identical in the SQL replay. */
  def bucket(t: Column, b: Int): Column =
    pmod(Dedup.h1(t), lit(b.toLong))

  /** The feature stream of a document, row-locally: unigram tokens,
    * plus space-joined adjacent bigram strings when `bigrams` — the
    * paper's hashed n-gram model (unigrams alone are the cheap
    * variant; bigrams capture the word-order signal). NULL text
    * features like empty text. */
  private[graft] def featureTokens(text: Column, bigrams: Boolean): Column = {
    val t = coalesce(Dedup.tokens(text), array().cast("array<string>"))
    if (!bigrams) t
    else concat(t, transform(TextOps.bigrams(t),
      bg => concat_ws(" ", bg.getField("w1"), bg.getField("w2"))))
  }

  /** Exact (bucket, count) table of a corpus's feature occurrences —
    * counts, not distinct presence: DSIR models feature frequency. */
  def bucketCounts(df: DataFrame, text: String, b: Int,
                   bigrams: Boolean = false): DataFrame =
    df.select(explode(featureTokens(col(text), bigrams)).as("t"))
      .select(bucket(col("t"), b).as("f"))
      .groupBy("f").agg(count(lit(1)).as("c"))

  /** The λ table: for every bucket f in 0..b-1,
    * λ_f = round(10⁶·(ln((t_f+1)/(T+b)) − ln((r_f+1)/(R+b)))) as a
    * long, where t/r are target/raw bucket counts and T/R their
    * totals. Buckets unseen in either corpus get the smoothed default
    * — new documents hashing there still score. Two bounded collects
    * (≤ b rows each). */
  def logRatios(raw: DataFrame, target: DataFrame, text: String,
                b: Int, bigrams: Boolean = false): Array[Long] = {
    require(b >= 2, "need at least 2 hash buckets")
    def counts(df: DataFrame): (Map[Long, Long], Long) = {
      val m = bucketCounts(df, text, b, bigrams).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (m, m.values.sum)
    }
    val (rc, rTot) = counts(raw)
    val (tc, tTot) = counts(target)
    Array.tabulate(b) { f =>
      val pT = (tc.getOrElse(f.toLong, 0L) + 1).toDouble / (tTot + b).toDouble
      val pR = (rc.getOrElse(f.toLong, 0L) + 1).toDouble / (rTot + b).toDouble
      BigDecimal(1000000.0 * (math.log(pT) - math.log(pR)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
  }

  /** Score every document against a λ table: row-local token hash +
    * array index + exact long sum (`logw_fp`, 1e-6 units) plus
    * `n_toks`. No join, no shuffle of text — the 100 TB scoring
    * shape. */
  def importanceWeights(df: DataFrame, id: String, text: String,
                        lam: Array[Long], b: Int,
                        bigrams: Boolean = false): DataFrame = {
    require(lam.length == b, s"λ table has ${lam.length} entries for $b buckets")
    val lamLit = typedLit(lam.toSeq)
    // with bigrams, n_toks counts FEATURES (unigrams + bigrams) — the
    // normalizer the mean-selection rule divides by must match the
    // stream being summed. NULL text scores like empty text (n_toks 0,
    // logw 0) — the oracle's LEFT JOIN + COALESCE contract; a bare
    // tokens(null) would propagate null through size/aggregate and
    // silently drop the doc from any keep-filter downstream
    df.select(col(id), featureTokens(col(text), bigrams).as("dsir_t"))
      .select(col(id),
        size(col("dsir_t")).cast("long").as("n_toks"),
        aggregate(col("dsir_t"), lit(0L),
          (acc, t) => acc +
            element_at(lamLit, (bucket(t, b) + 1).cast("int"))).as("logw_fp"))
  }

  /** The deterministic selection rule: keep documents whose PER-TOKEN
    * affinity clears the corpus mean — `logw/n > Σlogw/Σn`, evaluated
    * as the exact integer cross-multiplication
    * `logw·Σn > Σlogw·n` in decimal(38,0) (no division, no floats, no
    * RNG — this engine does not ship the paper's Gumbel-noise
    * resampling, which is data-order-dependent by design). One 2-long
    * global aggregate, broadcast back; token-less documents never
    * clear the bar. */
  def selectAboveMean(weights: DataFrame): DataFrame = {
    // the global sums accumulate in decimal(38,0), not long: at the
    // operator's own target scale (~2e13 tokens × ~5e5 mean |λ|) a
    // LONG Σlogw overflows 2⁶³ while the oracle's HUGEINT does not
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val tot = weights.agg(sum(dec(col("logw_fp"))).as("dsir_sl"),
      sum(dec(col("n_toks"))).as("dsir_sn"))
    weights.crossJoin(broadcast(tot))
      .withColumn("keep",
        (dec(col("logw_fp")) * dec(col("dsir_sn")) >
          dec(col("dsir_sl")) * dec(col("n_toks"))).cast("long"))
      .drop("dsir_sl", "dsir_sn")
  }

  /** Train-score-select in one call (the query-surface convenience). */
  def weights(raw: DataFrame, target: DataFrame, id: String, text: String,
              b: Int = 1024, bigrams: Boolean = false): DataFrame =
    selectAboveMean(
      importanceWeights(raw, id, text,
        logRatios(raw, target, text, b, bigrams), b, bigrams))
}
