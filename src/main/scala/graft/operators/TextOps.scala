package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators as COLUMN functions (scale extensions;
  * SURVEY §7.5): language ID by stopword voting and linear quality
  * scoring. Column-level so they compose into any projection — the
  * declared lang_id / quality_score queries and the TrainingPipeline
  * filter are the same expressions. All deterministic, all replayable
  * in SQL (fixed stopword lists, fixed tie order, division-last).
  */
object TextOps {

  val stopEn = Seq("the", "a", "is", "of", "and")
  val stopDe = Seq("der", "die", "das", "und", "ein")
  val stopFr = Seq("le", "la", "les", "des", "une")
  val stopEs = Seq("el", "los", "las", "una", "y")

  /** Stopword list per language code (quality scoring must use the
    * TARGET language's stopwords — the English list would make every
    * non-English corpus score near zero on stop density).
    */
  val stopsFor: Map[String, Seq[String]] =
    Map("en" -> stopEn, "de" -> stopDe, "fr" -> stopFr, "es" -> stopEs)

  /** Count of tokens drawn from a fixed word list. */
  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words.map(lit(_)): _*))).cast("long")

  /** Stopword-vote language prediction over a token array; ties resolve
    * by fixed priority en > de > es > fr (the oracle's CASE cascade).
    */
  def langPred(toks: Column): Column = {
    val (en, de, fr, es) = (countIn(toks, stopEn), countIn(toks, stopDe),
      countIn(toks, stopFr), countIn(toks, stopEs))
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Linear quality score: 0.5·stop_ratio + 0.05·avg_token_length.
    * Higher ≈ natural running text; boilerplate/code-ish content scores
    * low on stopword density. NULL for a tokenless document (rather
    * than a divide-by-zero error under ANSI mode).
    */
  def quality(toks: Column, stops: Seq[String] = stopEn): Column = {
    val n = size(toks).cast("long")
    val sumLen = aggregate(transform(toks, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)
    when(n === 0L, lit(null).cast("double"))
      .otherwise(lit(0.5) * (countIn(toks, stops) / n) + lit(0.05) * (sumLen / n))
  }

  /** Token document-frequency Count-Min sketch — the 100 TB lane of
    * corpus-frequency scoring: the exact path (rare_token_score)
    * broadcast-joins the full vocabulary df table, which stops fitting
    * when the vocabulary reaches billions of tokens; the sketch is a
    * fixed `O(1/eps · ln(1/confidence))`-cell array built distributed
    * (partition sketches merge associatively) and broadcast once.
    */
  def dfSketch(df: org.apache.spark.sql.DataFrame, id: String, text: String,
               eps: Double, confidence: Double
              ): org.apache.spark.util.sketch.CountMinSketch =
    df.select(col(id), explode(graft.operators.Dedup.tokens(col(text))).as("w"))
      .distinct()
      .stat.countMinSketch(col("w"), eps, confidence, seed = 42)

  /** Sketch-estimated rare-token scoring, same output shape as the
    * exact rare_token_score query. CMS error is ONE-SIDED (estimate >=
    * true count), so a token can only look more common than it is: the
    * gate may miss rare tokens with probability bounded by `confidence`
    * /`eps`, but never invents rarity — the conservative direction for
    * a rarity-driven quality filter. Probing is a row-local broadcast
    * lookup; the only shuffle is the per-doc aggregation of longs.
    */
  def rareTokenScoreSketch(df: org.apache.spark.sql.DataFrame, id: String,
                           text: String,
                           sketch: org.apache.spark.util.sketch.CountMinSketch,
                           rareCap: Long): org.apache.spark.sql.DataFrame = {
    val b = df.sparkSession.sparkContext.broadcast(sketch)
    val est = udf { w: String => b.value.estimateCount(w) }
    df.select(col(id), explode(graft.operators.Dedup.tokens(col(text))).as("w"))
      .withColumn("df", est(col("w")))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("df") <= rareCap, 1L).otherwise(0L)).as("n_rare"),
        sum(col("df")).as("df_sum"))
      .select(col(id), col("n_tokens"), col("n_rare"),
        (col("df_sum").cast("double") / col("n_tokens")).as("mean_df"))
  }
}
