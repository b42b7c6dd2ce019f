package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a two-class contrastive token
  * classifier at the fastText-lite altitude (Joulin et al. 2016 — linear
  * model over bag-of-words features; the quality-classifier shape of
  * CCNet/GPT-3-style corpus curation, where a model trained to separate
  * a curated reference from raw crawl scores every crawl document).
  *
  * Scale extension — no reference counterpart (SURVEY §7.5). The model
  * here is deliberately integer-exact: a token's weight is the
  * cross-multiplied difference of class-conditional document frequencies
  *
  *   w(t) = df_pos(t)·N_neg − df_neg(t)·N_pos
  *
  * (the unnormalized form of P(t|pos) − P(t|neg): divide by N_pos·N_neg
  * to recover it). A document's score is the sum of w(t) over its
  * DISTINCT tokens, positive when the document's vocabulary leans toward
  * the positive class. Every quantity is an exact integer (decimal(38,0)
  * — df ≤ N ≤ 10¹², products ≤ 10²⁴, doc sums ≤ 10²⁹ all fit), so sums
  * are order-independent and the DuckDB oracle replays the arithmetic in
  * HUGEINT bit-for-bit. The float-softmax / SGD lane of a real fastText
  * is deliberately out of scope: training there is data-order-dependent,
  * which contradicts this engine's determinism contract.
  *
  * Scale shape: per-doc feature extraction is ROW-LOCAL
  * (`array_distinct` before the explode — no distinct shuffle); training
  * is ONE map-side-combined aggregation shuffling (token, two longs)
  * rows; the weight table is vocabulary-sized (the small artifact — train
  * once, persist, reuse per batch) and BROADCAST to the scorer, so
  * scoring never shuffles text — only (id, partial-sum) rows after the
  * map-side combine. For corpora whose raw vocabulary outgrows a
  * broadcast (unbounded unicode garbage), `hashBuckets` > 0 applies the
  * hashing trick: features become 60-bit-md5 buckets, bounding the model
  * at the cost of collision noise (standard fastText practice).
  */
object Classify {

  /** The document's DISTINCT feature keys, row-locally: tokens (or their
    * hash buckets when `hashBuckets` > 0) deduplicated INSIDE the row —
    * binarized bag-of-words needs each feature once per doc, and two
    * tokens colliding into one bucket must still count once. No distinct
    * shuffle ever touches the token stream.
    */
  private def featureArray(text: Column, hashBuckets: Int): Column = {
    val toks = Dedup.tokens(text)
    val keys =
      if (hashBuckets <= 0) toks
      else transform(toks,
        t => pmod(Dedup.h1(t), lit(hashBuckets.toLong)).cast("string"))
    array_distinct(keys)
  }

  /** Distinct (id, feature, y) rows — see [[featureArray]]. */
  private def features(df: DataFrame, id: String, text: String,
                       label: Column, hashBuckets: Int): DataFrame =
    df.select(col(id), label.cast("boolean").as("y"),
      explode(featureArray(col(text), hashBuckets)).as("feature"))

  /** Train: (feature, w) with w = df_pos·N_neg − df_neg·N_pos as exact
    * decimal(38,0). One aggregation over the feature stream plus one
    * 1-row class-count aggregate (broadcast). The result is the model
    * artifact — persist it and feed [[scoreDocs]] per incoming batch.
    */
  def trainTokenWeights(df: DataFrame, id: String, text: String, label: Column,
                        hashBuckets: Int = 0): DataFrame = {
    val y = label.cast("boolean")
    val counts = df.agg(
      sum(when(y, 1L).otherwise(0L)).as("n_pos"),
      sum(when(!y, 1L).otherwise(0L)).as("n_neg"))
    val dfs = features(df, id, text, label, hashBuckets)
      .groupBy(col("feature"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("df_pos"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("df_neg"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    dfs.crossJoin(broadcast(counts))
      .select(col("feature"),
        (dec(col("df_pos")) * dec(col("n_neg"))
          - dec(col("df_neg")) * dec(col("n_pos"))).cast("decimal(38,0)").as("w"))
  }

  /** Score: per doc, the exact sum of weights over its distinct features
    * plus the prediction (score > 0 ⇒ positive class). The weight table
    * joins BROADCAST against the row-local feature stream; unseen
    * features (absent from training) contribute 0. Documents with no
    * tokens have no features and are absent — gate them upstream with a
    * length filter, as every quality pipeline does anyway.
    */
  def scoreDocs(df: DataFrame, id: String, text: String, weights: DataFrame,
                hashBuckets: Int = 0): DataFrame = {
    val feats = df.select(col(id),
      explode(featureArray(col(text), hashBuckets)).as("feature"))
    feats.join(broadcast(weights), Seq("feature"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_terms"),
        sum(coalesce(col("w"), lit(0).cast("decimal(38,0)")))
          .cast("decimal(38,0)").as("score_dec"))
      // BIGINT 0/1 rather than BOOLEAN, and score as STRING: both
      // engine-portable carriers (the driver's result hashing
      // canonicalizes integers but not booleans, and a DECIMAL(38,0)
      // survives some drivers as float64 — the string form of an exact
      // integer is representation-stable at any magnitude).
      .withColumn("pred", (col("score_dec") > 0).cast("long"))
      .withColumn("score", col("score_dec").cast("string"))
      .drop("score_dec")
      .select(col(id), col("n_terms"), col("score"), col("pred"))
  }

  /** Held-out evaluation: collapse a labeled+scored frame to ONE row of
    * confusion counts plus precision/recall/F1/accuracy in exact
    * parts-per-million. `y` and `pred` are 0/1 longs. Integer DIV of
    * non-negative longs throughout — no float ever enters the row, so a
    * SQL oracle replays it bit-for-bit; undefined ratios (an empty
    * predicted- or true-positive class) surface as NULL rather than a
    * fake 0, the convention every eval harness expects.
    */
  def evaluate(labeled: DataFrame, y: Column, pred: Column): DataFrame =
    labeled.agg(
        sum(when(y === 1 && pred === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(y === 0 && pred === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(y === 1 && pred === 0, 1L).otherwise(0L)).as("fn"),
        sum(when(y === 0 && pred === 0, 1L).otherwise(0L)).as("tn"))
      .selectExpr("tp", "fp", "fn", "tn",
        "CASE WHEN tp+fp = 0 THEN NULL ELSE (tp*1000000) DIV (tp+fp) END AS precision_ppm",
        "CASE WHEN tp+fn = 0 THEN NULL ELSE (tp*1000000) DIV (tp+fn) END AS recall_ppm",
        "CASE WHEN 2*tp+fp+fn = 0 THEN NULL ELSE (2*tp*1000000) DIV (2*tp+fp+fn) END AS f1_ppm",
        "((tp+tn)*1000000) DIV (tp+fp+fn+tn) AS accuracy_ppm")
}
