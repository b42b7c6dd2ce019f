package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Aggregators

/** Lexical retrieval over a document corpus: BM25 ranking and a bounded
  * inverted index — the query-side complement of the corpus-frequency
  * scoring in TextQueries (rare_token_score) and the engine's lexical
  * counterpart to the embedding ANN family (Similarity).
  *
  * The reference has no retrieval operator (its Grep example is a
  * regex scan, examples/Grep.java:49-100); this is engine-added surface
  * for the training-data use cases: "pull the k most relevant documents
  * for each probe query" (eval-set curation, targeted corpus audits)
  * and "which documents contain term t" (index-backed spot lookups).
  *
  * 100 TB shape, BM25: two corpus scans and one bounded shuffle.
  *  - Scan 1 aggregates the global stats BM25 needs (N, total token
  *    count, per-query-term document frequencies) into ONE short row —
  *    partial aggregation does the work map-side; the driver collect is
  *    O(#query terms), the same bounded-collect contract as the IVF
  *    codebook (Similarity.scala).
  *  - Scan 2 scores every document ROW-LOCALLY: tf of each query term
  *    comes from `size(filter(tokens, _ == term))` against the literal
  *    term — no tokenize-shuffle, no join; the stats ride in as
  *    literals. A document scores `0` for absent terms exactly
  *    ((0*k)/x == 0.0 in IEEE), so no special-casing.
  *  - The only shuffle is the bounded top-k aggregation
  *    (Aggregators.TopKByScore): k rows per (partition, query) cross
  *    the wire, never a per-query window over all scored docs.
  *
  * Determinism contract (what makes the DuckDB oracle hash-match): the
  * score avoids transcendental functions. Classic BM25 idf is
  * `ln((N-df+0.5)/(df+0.5))`; `ln` is not required to be correctly
  * rounded by IEEE 754, so two engines may disagree in the last ulp and
  * flip a rank. The oracle-checked lane therefore uses the RATIONAL idf
  * — the log's argument `(N-df+0.5)/(df+0.5)` — which is monotone in df
  * like the log form and built only from +,-,*,/ (each exactly rounded,
  * so bit-identical across engines given the same expression tree). The
  * classic log form is available via `logIdf = true` for in-Spark use
  * and is spec-tested in ScalaTest instead.
  */
object Retrieval {

  private def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** One query: id + its DISTINCT terms (duplicate terms in a query
    * string would double-weight a term; dedupe at construction).
    */
  final case class Query(qId: Long, terms: Seq[String]) {
    require(terms.nonEmpty && terms.distinct == terms,
      s"query $qId needs non-empty distinct terms, got $terms")
  }

  /** Global BM25 stats in one aggregate row: corpus size, total token
    * count, and per-term document frequency for `terms`.
    */
  private case class Stats(n: Long, sumDl: Long, df: Map[String, Long])

  private def collectStats(docs: DataFrame, textCol: String,
                           terms: Seq[String]): Stats = {
    val toks = tokens(col(textCol))
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df$i")
    }
    val aggs = Seq(count(lit(1)).as("n"), sum(size(toks)).as("sumdl")) ++ dfCols
    val row = docs.agg(aggs.head, aggs.tail: _*).head()
    Stats(row.getAs[Long]("n"), row.getAs[Long]("sumdl"),
      terms.zipWithIndex.map { case (t, i) => t -> row.getAs[Long](s"df$i") }.toMap)
  }

  /** Top-k docs per query by BM25 (k1, b defaults per Robertson et al.).
    * Output: (q_id, doc_id, rnk), rank 1 = most relevant; only docs
    * containing at least one query term rank. See object scaladoc for
    * the plan shape and the `logIdf` determinism trade.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[Query], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               logIdf: Boolean = false): DataFrame = {
    val allTerms = queries.flatMap(_.terms).distinct
    val stats = collectStats(docs, textCol, allTerms)
    val nD = lit(stats.n.toDouble)
    // avgdl enters every row identically: sumdl/n as a double literal
    // expression evaluated in-engine (same tree in the oracle)
    val avgdl = lit(stats.sumDl.toDouble) / nD
    val toks = tokens(col(textCol))
    val dl = size(toks).cast("double")

    def termScore(term: String): Column = {
      val dfD = lit(stats.df(term).toDouble)
      val odds = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
      val idf = if (logIdf) log(odds + lit(1.0)) else odds
      val tf = size(filter(toks, t => t === term)).cast("double")
      // (tf*(k1+1)) / (tf + k1*((1-b) + b*(dl/avgdl))): zero for absent
      // terms exactly, so no conditional needed
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (dl / avgdl))))
    }
    // fixed-order row-local sum per query (not an aggregation): the
    // term-addition order is part of the determinism contract
    def queryScore(q: Query): Column =
      q.terms.map(termScore).reduceLeft(_ + _)

    val scored = docs.select(
      col(idCol).cast("long").as("doc_id"),
      explode(array(queries.map(q =>
        struct(lit(q.qId).as("q_id"), queryScore(q).as("score"))): _*)).as("qs"))
      .select(col("doc_id"), col("qs.q_id").as("q_id"), col("qs.score").as("score"))
      .filter(col("score") > 0)
    scored.groupBy(col("q_id"))
      .agg(Aggregators.topKByScore(col("score"), col("doc_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "doc_id")))
      .select(col("q_id"), col("doc_id"), (col("pos") + 1).as("rnk"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09): combine several
    * retrieval runs — each a (q_id, doc_id, rnk) frame, rank 1 best —
    * into one ranking by `score(d) = Σ_runs 1/(c + rnk_run(d))`, a doc
    * absent from a run contributing 0. The standard hybrid-retrieval
    * combiner (lexical BM25 + dense ANN) because it needs no score
    * calibration between runs — only ranks.
    *
    * 100 TB shape: each input run is already a bounded top-k (k rows
    * per query by construction of [[bm25TopK]] / Similarity.*TopK), so
    * fusion touches (#queries x k x #runs) narrow rows — the full-outer
    * join chain and the final bounded top-k merge are negligible next
    * to the runs that produced the inputs. Determinism: 1/(c+rnk) from
    * integer ranks is one exactly-rounded IEEE division, the two-run
    * sum is order-insensitive, and ties break doc_id-asc in the
    * bounded aggregator — so a SQL oracle replays the fusion exactly.
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    val contribs = runs.zipWithIndex.map { case (r, i) =>
      r.select(col("q_id"), col("doc_id"),
        (lit(1.0) / (lit(c.toDouble) + col("rnk").cast("double"))).as(s"c$i"))
    }
    val joined = contribs.reduceLeft(
      (a, b) => a.join(b, Seq("q_id", "doc_id"), "full_outer"))
    // fixed left-associated sum: the term order is part of the
    // determinism contract (bm25TopK queryScore discipline)
    val score = contribs.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0))).reduceLeft(_ + _)
    joined.select(col("q_id"), col("doc_id"), score.as("score"))
      .groupBy(col("q_id"))
      .agg(Aggregators.topKByScore(col("score"), col("doc_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "doc_id")))
      .select(col("q_id"), col("doc_id"), (col("pos") + 1).as("rnk"))
  }

  /** Bounded inverted index: per term, document frequency + the `k`
    * LOWEST doc ids as a comma-joined postings preview. The per-term
    * state is O(k) end to end (TopKByScore with a constant score
    * degenerates to "k smallest ids" via its id-asc tiebreak) — a
    * common term's full postings list never materializes on one task,
    * which is what kills naive `collect_list` inverted-index builds at
    * corpus scale. One shuffle: the groupBy(term) with map-side
    * partials. Terms are de-duplicated per document row-locally
    * (array_distinct) before the explode, so `df` counts documents.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        Aggregators.topKByScore(lit(0.0), col("doc_id"), k).as("ids"))
      .select(col("term"), col("df"),
        concat_ws(",", col("ids").cast("array<string>")).as("postings_head"))

  /** Per-document TF-IDF keyword extraction: the top-k most
    * characteristic terms of each document (topic labeling / data-card
    * keywords). Scoring is the exact-integer surrogate `tf·10⁶ DIV df`
    * — monotone in tf/df, so ranks agree with real tf-idf's rarity
    * ordering at equal tf while never putting a float in the row; ties
    * break by term ascending, fully deterministic. Two term-keyed
    * aggregations (both map-side combined) + one vocabulary-scale join;
    * the final ranking window partitions by DOCUMENT, whose distinct
    * term count is bounded by document length — never a corpus-scale
    * window partition.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k > 0, "need k > 0 keywords per document")
    val tf = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("score_fp", expr("tf * 1000000 DIV df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score_fp"), col("rnk"))
  }
}
