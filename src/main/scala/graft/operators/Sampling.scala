package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset-shaping operators for training-data pipelines.
  *
  * The reference samples via InputSampler (Random/Split/IntervalSampler,
  * mapreduce/lib/partition/InputSampler.java:58-230), whose output
  * depends on split layout and RNG seed. These are the Spark-scale forms
  * with a stronger property: the result is a pure FUNCTION of the data
  * (hash-ranked / hash-sharded), so any cluster, partitioning, or retry
  * reproduces it bit-for-bit — and a SQL oracle can replay it.
  */
object Sampling {

  /** 52-bit hash key: exactly representable as a Double (TopKByScore
    * scores are doubles) and replayable in SQL as
    * `('0x' || substring(md5(...), 1, 13))::BIGINT`.
    */
  def hashKey(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 13), 16, 10).cast("long")

  /** The `k` rows per stratum whose md5(id) ranks lowest — a
    * deterministic per-stratum sample of fixed size. Ranking runs
    * through the bounded [[graft.functions.Aggregators.TopKByScore]]
    * aggregator: map-side partials keep ≤k rows per (partition,
    * stratum), so the shuffle carries k·partitions rows per stratum,
    * never a stratum's full membership to one task (the
    * `row_number() OVER (PARTITION BY stratum)` anti-pattern — the
    * ORACLE uses that window; this plan must not, see PlanSpec).
    * Hash ties (52-bit, ~n²/2⁵³ odds) break toward the lower id on
    * both sides.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       k: Int): DataFrame =
    df.select(col(strataCol), col(idCol).cast("long").as(idCol),
      hashKey(col(idCol)).as("hk"))
      .groupBy(col(strataCol))
      .agg(graft.functions.Aggregators.topKByScore(
        -col("hk").cast("double"), col(idCol), k).as("ids"))
      .select(col(strataCol), explode(col("ids")).as(idCol))

  /** Sequential sequence-packing: within each (stratum, hash-shard),
    * documents in `orderCol` order accumulate into packs of at most
    * `budget` tokens (exclusive prefix sum / budget). Packing is
    * order-DEFINED, so each unit is sequential by nature; `shards`
    * bounds the sequential unit — at 100 TB you raise shards so a
    * stratum's packing parallelizes, at the cost of packs never
    * crossing shard boundaries (the standard corpus-sharding trade).
    * Returns one row per pack: (stratum, shard, pack_id, n_docs,
    * tok_sum).
    */
  def packBySize(df: DataFrame, strataCol: String, orderCol: String,
                 tokenCol: Column, budget: Int, shards: Int): DataFrame = {
    val shard = pmod(hashKey(col(orderCol)), lit(shards.toLong)).as("shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("shard")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(strataCol), col(orderCol), tokenCol.cast("long").as("toks"), shard)
      .withColumn("prior", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("prior") / budget))
      .groupBy(col(strataCol), col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tok_sum"))
  }

  /** Fixed-length sequence-packing MANIFEST — the terminal stage of an
    * LLM data pipeline: documents concatenated in deterministic order
    * and cut into `seqLen`-token training windows, a document spanning
    * a boundary split across consecutive windows. Emitted as compact
    * spans (shard, seq_id, doc, doc_tok_start, n_toks, seq_pos) — the
    * dataloader materializes token arrays from this manifest; span
    * rows scale with documents + boundary crossings, never with
    * tokens.
    *
    * Scale: packing runs WITHIN hash shards (the [[packBySize]]
    * discipline) — each shard's running-offset window sorts only its
    * own slice, so no single-task global prefix sum exists at any
    * corpus size; `shards` matches the dataloader's file parallelism.
    * All integer arithmetic, so a SQL oracle replays the full manifest.
    * Zero-token docs are excluded (an empty interval has no window).
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: Column,
                    seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0, s"bad packing: seqLen=$seqLen shards=$shards")
    val L = seqLen.toLong
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol), tokenCol.cast("long").as("toks"),
        pmod(hashKey(col(idCol)), lit(shards.toLong)).as("shard"))
      .filter(col("toks") > 0)
      .withColumn("prior", coalesce(sum(col("toks")).over(w), lit(0L)))
      // exact floor division (Column `/` is double division; the
      // decimal-floor path is exact at any offset — the quantizeLinear
      // argument)
      .withColumn("seq_id", explode(sequence(
        floor(col("prior").cast("decimal(38,0)") / L).cast("long"),
        floor((col("prior") + col("toks") - 1).cast("decimal(38,0)") / L)
          .cast("long"))))
      .select(col("shard"), col("seq_id"), col(idCol),
        (greatest(col("prior"), col("seq_id") * L) - col("prior")).as("doc_tok_start"),
        (least(col("prior") + col("toks"), (col("seq_id") + 1) * L)
          - greatest(col("prior"), col("seq_id") * L)).as("n_toks"),
        (greatest(col("prior"), col("seq_id") * L) - col("seq_id") * L).as("seq_pos"))
  }

  /** Deterministic mixture sampling — the data-mixing step of a
    * training run: each stratum (source/domain/language) gets a
    * sampling RATE; rate < 1 downsamples by hash threshold, rate ≥ 1
    * emits floor(rate) copies of every row plus one more for the
    * hash-selected fraction (fractional epoch weighting, e.g. 2.5×
    * wiki). Pure projection + filter + explode: no shuffle, no RNG
    * state — the kept multiset is a function of the data, identical on
    * any cluster or retry, and a SQL oracle replays it. Output adds
    * `copy_id` (0-based replica index).
    */
  def mixtureSample(df: DataFrame, strataCol: String, idCol: String,
                    rates: Map[String, Double],
                    defaultRate: Double = 1.0): DataFrame =
    mixtureWeights(df, strataCol, idCol, rates, defaultRate)
      .withColumn("copy_id", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")

  /** Temperature-sampling mixture at α = 1/2 — the multilingual/
    * multi-source balancing staple (upsample small strata toward a
    * √size-proportional share, downsample the head) — with the kept
    * multiset EXACT and engine-portable. The float formulation
    * (rate ∝ n^(α−1)/Σn^α) dies on cross-engine float summation order,
    * so the law here is integer end-to-end:
    *
    *   w_s  = floor(sqrt(n_s))          (IEEE sqrt is exact floor for
    *                                     n_s ≪ 2^52; both engines agree)
    *   rate_s = w_s·N / (Σw · n_s)      as the exact rational (num, den)
    *   n_copies = num div den  +  [hk < t_s],
    *   t_s  = ((num mod den) · 2^52) div den   (BigInt, driver-side)
    *
    * so every per-row decision is one LONG comparison against a
    * precomputed integer threshold — the DSIR cross-multiplication
    * discipline — and a SQL oracle replays it bit-for-bit in HUGEINT.
    * Corpus-size preserving in expectation (Σ rate_s·n_s = N up to the
    * ≤2^-52 threshold floor). The per-stratum count collect is a
    * bounded driver artifact (#strata rows). Output = input rows +
    * `copy_id`, like [[mixtureSample]].
    */
  def temperatureMixture(df: DataFrame, strataCol: String,
                         idCol: String): DataFrame = {
    require(!df.columns.contains("n_copies") && !df.columns.contains("copy_id"),
      "mixture weighting reserves working columns n_copies/copy_id " +
        "(re-weighting a previous mixture output would silently clobber them)")
    val countRows = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect()
    require(countRows.nonEmpty, "temperatureMixture: empty corpus")
    require(countRows.forall(!_.isNullAt(0)),
      "temperatureMixture: NULL stratum — a null key would be counted " +
        "in the totals but silently dropped from the output; filter or " +
        "coalesce the strata column first")
    require(countRows.forall(_.getLong(1) < (1L << 40)),
      "stratum too large for the exact isqrt law (>= 2^40 rows/stratum)")
    def isqrt(v: Long): Long = math.sqrt(v.toDouble).toLong
    val total = BigInt(countRows.map(_.getLong(1)).sum)
    val sw = BigInt(countRows.map(r => isqrt(r.getLong(1))).sum)
    val twoTo52 = BigInt(1) << 52
    // (stratum, base, threshold) as a tiny BROADCAST table, not a
    // when-chain: works for any strata type and any cardinality (a
    // domain-strata corpus has tens of thousands of values — a chain
    // that deep blows codegen's method limit and the analyzer's stack)
    val spark = df.sparkSession
    val planRows = countRows.map { r =>
      val n = BigInt(r.getLong(1))
      val num = BigInt(isqrt(r.getLong(1))) * total
      val den = sw * n
      org.apache.spark.sql.Row(r.get(0), (num / den).toLong,
        ((num % den) * twoTo52 / den).toLong)
    }
    val planDf = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(planRows: _*)),
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(strataCol).copy(name = strataCol),
        org.apache.spark.sql.types.StructField("__tm_base",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__tm_thr",
          org.apache.spark.sql.types.LongType, nullable = false))))
    df.join(broadcast(planDf), Seq(strataCol))
      .withColumn("n_copies", col("__tm_base") +
        when(hashKey(col(idCol)) < col("__tm_thr"), 1L).otherwise(0L))
      .drop("__tm_base", "__tm_thr")
      .filter(col("n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** The copy-multiplicity half of [[mixtureSample]]: adds `n_copies`
    * and drops rows weighted to zero, WITHOUT exploding replicas. Lets
    * a pipeline defer the explosion past cheaper-per-row stages — e.g.
    * chunk each unique doc once, then replicate the (narrow) chunk
    * rows — the kept multiset is identical either way.
    */
  def mixtureWeights(df: DataFrame, strataCol: String, idCol: String,
                     rates: Map[String, Double],
                     defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(_ >= 0) && defaultRate >= 0,
      "mixture rates must be >= 0 — a negative rate drops its stratum " +
        "exactly like 0.0, which is more likely a caller bug; say 0.0")
    require(!df.columns.contains("n_copies") && !df.columns.contains("copy_id"),
      "mixture weighting reserves working columns n_copies/copy_id " +
        "(re-weighting a previous mixture output would silently clobber them)")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    // hk uniform on [0, 2^52); hk < frac·2^52 keeps the frac-fraction.
    // Both sides of the comparison are exact doubles (hk ≤ 2^52), so
    // the decision replays bit-identically in SQL.
    val twoTo52 = 4503599627370496.0
    val nCopies = (floor(rate).cast("long") +
      when(hashKey(col(idCol)).cast("double") < (rate - floor(rate)) * twoTo52, 1L)
        .otherwise(0L)).as("n_copies")
    df.withColumn("n_copies", nCopies).filter(col("n_copies") > 0)
  }

  /** Token-budget sampling — real data mixtures are specified in
    * TOKENS per source ("50B web, 10B wiki"), not rows: keep each
    * stratum's hash-ordered document prefix until its token budget is
    * spent. Budgets divide evenly across `shards` hash-shards and the
    * cumulative sum runs within (stratum, shard) — the [[packBySize]]
    * discipline — so no stratum ever needs a single-task global prefix
    * scan, at the cost of ±one document's tokens per shard against the
    * exact budget. A document is kept while the tokens BEFORE it (in
    * 52-bit-hash order, id tiebreak) fit the shard budget, so the
    * budget overshoots by at most one document per shard rather than
    * truncating documents. Deterministic: the kept set is a pure
    * function of the data, and a SQL oracle replays it window-for-
    * window. Strata absent from `budgets` pass through unsampled
    * (budget = unlimited) unless `defaultBudget` says otherwise.
    */
  def tokenBudgetSample(df: DataFrame, strataCol: String, idCol: String,
                        tokenCol: Column, budgets: Map[String, Long],
                        shards: Int = 1,
                        defaultBudget: Option[Long] = None): DataFrame = {
    require(shards > 0, "need at least one shard")
    require(budgets.values.forall(_ >= 0) && defaultBudget.forall(_ >= 0),
      "token budgets must be >= 0")
    val reserved = Seq("hk", "shard", "prior_toks", "shard_budget")
    // case-insensitive: Spark's default resolver would clobber "Shard"
    // through withColumn("shard", ...) just the same
    require(!df.columns.map(_.toLowerCase).exists(reserved.contains),
      s"tokenBudgetSample reserves working columns ${reserved.mkString("/")} " +
        "(a caller column of that name would be clobbered then dropped)")
    // CEILING split: floor would turn a budget below `shards` into a
    // zero per-shard budget and silently drop the stratum; ceiling
    // over-allocates at most shards-1 tokens, inside the documented
    // ±one-document-per-shard tolerance
    def perShard(v: Long) = (v + shards - 1) / shards
    val budget = budgets.foldLeft(
      defaultBudget.map(b => lit(perShard(b))).getOrElse(lit(null).cast("long"))) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(perShard(v))).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("shard"))
      .orderBy(col("hk"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("hk", hashKey(col(idCol)))
      .withColumn("shard", pmod(col("hk"), lit(shards.toLong)))
      .withColumn("prior_toks",
        coalesce(sum(tokenCol.cast("long")).over(w), lit(0L)))
      .withColumn("shard_budget", budget)
      .filter(col("shard_budget").isNull || col("prior_toks") < col("shard_budget"))
      .drop("hk", "shard", "prior_toks", "shard_budget")
  }

  /** Deterministic train/val/test split assignment: each row lands in
    * the bucket its 52-bit id-hash selects — row-local (no shuffle, no
    * RNG state, drops into a streaming filter), stable under any
    * partitioning or retry, and leakage-proof across runs because
    * membership is a pure function of the id. `fractions` are ordered
    * (name, fraction) pairs; any hash-space remainder falls to the LAST
    * split. Thresholds are cumulative-fraction × 2^52 compared as exact
    * doubles, so a SQL oracle replays the assignment bit-identically
    * (the [[mixtureWeights]] discipline).
    */
  def hashSplit(df: DataFrame, idCol: String,
                fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0) &&
      fractions.map(_._2).sum <= 1.0 + 1e-9,
      "need non-negative split fractions summing to <= 1")
    val twoTo52 = 4503599627370496.0
    val hk = hashKey(col(idCol)).cast("double")
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val first = when(hk < cum.head * twoTo52, lit(fractions.head._1))
    val chain = fractions.tail.zip(cum.tail).foldLeft(first) {
      case (acc, ((name, _), c)) => acc.when(hk < c * twoTo52, lit(name))
    }
    df.withColumn("split", chain.otherwise(lit(fractions.last._1)))
  }

  /** Deterministic global training-order shuffle: every row gets a
    * hash shard and a within-shard sort key, both pure functions of the
    * id (domain-separated from [[hashKey]]'s sampling hash, so shuffle
    * order is independent of sampling decisions). A dataloader reads
    * shards in parallel and each shard sorted by `sort_key` — a
    * reproducible global permutation with NO global sort: the only
    * at-scale cost is the write-side `repartition(shard) +
    * sortWithinPartitions(sort_key)`, which this projection feeds.
    */
  def shuffleOrder(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, "need at least one shard")
    val ord = md5(concat(col(idCol).cast("string"), lit(":ord")))
    df.withColumn("shard",
        pmod(conv(substring(ord, 1, 13), 16, 10).cast("long"), lit(shards.toLong)))
      .withColumn("sort_key", ord)
  }

  /** The WRITE side of [[shuffleOrder]]: materialize the deterministic
    * global permutation as `shards` parquet directories, each file
    * sorted by the in-shard sort key — the dataloader handoff (readers
    * consume shard dirs in parallel; each shard streams in its defined
    * order with no read-time sort). `repartition(shard)` is the only
    * shuffle; the in-shard sort is per-partition. Returns the shard
    * count written.
    */
  def writeShards(df: DataFrame, idCol: String, shards: Int,
                  outDir: String): Int = {
    shardLanding(df, idCol, shards)
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    shards
  }

  /** [[writeShards]]' pre-write plan, exposed so the plan pin binds to
    * the real code path (one shard exchange, in-partition sort only).
    */
  private[graft] def shardLanding(df: DataFrame, idCol: String,
                                  shards: Int): DataFrame =
    shuffleOrder(df, idCol, shards)
      .repartition(shards, col("shard"))
      // shard FIRST: the dynamic-partition writer requires its
      // partition column sorted and would otherwise re-sort by shard
      // alone, destroying the in-shard key order
      .sortWithinPartitions("shard", "sort_key")

  /** Exact quantile cutoffs for [[quantileBins]]: the (nBins-1)
    * interior percentiles of `value`, one aggregation job and a BOUNDED
    * single-row collect (nBins-1 doubles to the driver). Exact
    * percentile is the oracle-replayable lane; a 100 TB run with a
    * huge value domain swaps in `approx_percentile` — same downstream
    * binning, documented trade.
    */
  def quantileCutoffs(df: DataFrame, value: Column, nBins: Int): Seq[Double] = {
    require(nBins >= 2, "need at least 2 bins")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    df.agg(percentile(value, typedLit(probs)).as("cuts"))
      .head().getSeq[Double](0)
  }

  /** Bin assignment against fixed cutoffs as a PURE PROJECTION:
    * bin = 1 + |{cutoffs strictly below the value}| — the cutoffs ride
    * to executors as a literal array, so binning a row never shuffles
    * or windows (vs the `ntile() OVER (ORDER BY ...)` anti-pattern: a
    * single-task global sort that cannot survive scale-up). NULL values
    * get NULL bins.
    */
  def binByCutoffs(value: Column, cutoffs: Seq[Double]): Column =
    when(value.isNull, lit(null).cast("int"))
      .otherwise(size(filter(typedLit(cutoffs), c => value > c)) + 1)

  /** Curriculum/quality binning: rows split into `nBins` equal-count
    * bins of `valueCol` (deciles by default elsewhere in the library) —
    * quantile cutoffs once, then row-local assignment. The shape every
    * curriculum schedule and quality-tier mixture needs at scale.
    */
  def quantileBins(df: DataFrame, valueCol: String, nBins: Int): DataFrame =
    df.withColumn("bin",
      binByCutoffs(col(valueCol), quantileCutoffs(df, col(valueCol), nBins)))

  /** Token-window chunking — the slicing complement of [[packBySize]]:
    * each document's token stream splits into training-window chunks of
    * at most `maxTokens` tokens, consecutive chunks sharing `overlap`
    * tokens (long-document context-window slicing). Chunk starts are
    * 1, 1+s, 1+2s, ... with stride s = maxTokens - overlap, and no
    * chunk starts inside the final `overlap` tokens, so a trailing
    * chunk fully contained in its predecessor is never emitted.
    * `carry` columns pass through unchanged onto every chunk row. One
    * narrow projection + explode — map-only, no shuffle, at any scale.
    */
  def chunkDocs(df: DataFrame, id: String, text: String,
                maxTokens: Int, overlap: Int,
                carry: Seq[String] = Nil): DataFrame = {
    require(overlap >= 0 && maxTokens > overlap, "need maxTokens > overlap >= 0")
    val reserved = Set("t", "n", "start", "chunk_id", "chunk_text", "n_tokens")
    require((id +: carry).forall(c => !reserved.contains(c)),
      s"id/carry columns collide with a chunkDocs working/output column")
    val stride = maxTokens - overlap
    val keep = col(id) +: carry.map(col)
    df.select(keep :+ graft.operators.Dedup.tokens(col(text)).as("t"): _*)
      .withColumn("n", size(col("t")))
      .filter(col("n") > 0)
      .select(keep ++ Seq(col("t"), col("n"),
        explode(sequence(lit(1), greatest(col("n") - overlap, lit(1)),
          lit(stride))).as("start")): _*)
      .select(keep ++ Seq(
        ((col("start") - 1) / stride).cast("long").as("chunk_id"),
        array_join(slice(col("t"), col("start"), lit(maxTokens)), " ").as("chunk_text"),
        least(lit(maxTokens), col("n") - col("start") + 1).cast("long").as("n_tokens")): _*)
  }
}
