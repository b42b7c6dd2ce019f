package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Retrieval, Similarity}
import graft.operators.Retrieval.Query

/** Lexical retrieval over `documents`: BM25 top-k and the bounded
  * inverted index (operators/Retrieval.scala). The oracle replays the
  * identical rational-idf BM25 arithmetic — every constant here (k1=1.5,
  * b=0.75 → 2.5, 0.25) is exactly representable in binary, and the score
  * uses only exactly-rounded IEEE ops (+,-,*,/), so both engines produce
  * bit-identical doubles and the ranks hash-match (see Retrieval
  * scaladoc for why log-idf can't be oracle-checked).
  */
object RetrievalQueries extends QueryModule {

  // probe queries: a rare+common pair (dup: df~25 of 500 at sf0.001),
  // a common pair, and a single term — exercises idf spread, the
  // multi-term fixed-order sum, and the degenerate one-term case
  private val probes = Seq(
    Query(1L, Seq("dup", "stream")),
    Query(2L, Seq("hash", "join")),
    Query(3L, Seq("vector")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_topk" -> ((s, dir) =>
      Retrieval.bm25TopK(Tables(s, dir, "documents"), "doc_id", "text",
        probes, k = 10, k1 = 1.5, b = 0.75)),

    "inverted_index" -> ((s, dir) =>
      Retrieval.invertedIndex(Tables(s, dir, "documents"), "doc_id", "text",
        k = 10)),

    // HYBRID retrieval: BM25 top-20 + dense cosine top-20 fused by
    // reciprocal rank (Retrieval.rrfFuse, c=60) into a final top-10 —
    // the lexical+embedding combination a RAG curation pipeline runs.
    // Dense probe vectors are vec_id 0/50/100, remapped onto the BM25
    // probe ids 1/2/3 (the fixture's doc_id<->vec_id identity). Both
    // constituent rankings are the already-oracle-green lanes
    // (bm25_topk rational-idf arithmetic, ann_cosine_topk sequential
    // dot product), and the fusion adds only exactly-rounded IEEE ops,
    // so DuckDB replays the fused ranks bit-for-bit.
    "hybrid_rrf" -> ((s, dir) => {
      val sparse = Retrieval.bm25TopK(Tables(s, dir, "documents"),
        "doc_id", "text", probes, k = 20, k1 = 1.5, b = 0.75)
      val emb = Tables(s, dir, "embeddings")
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id").isin(0L, 50L, 100L)),
          "vec_id", "embedding", k = 20)
        .select(((col("q_id") / 50).cast("long") + 1).as("q_id"),
          col("n_id").as("doc_id"), col("rnk"))
      Retrieval.rrfFuse(Seq(sparse, dense), k = 10)
    }),

    // per-document keyword extraction (Retrieval.tfidfTopK): top-5
    // characteristic terms by the exact-integer tf·10⁶ DIV df score,
    // term-ascending tie-break — topic labeling / data-card keywords.
    "tfidf_topk" -> ((s, dir) =>
      Retrieval.tfidfTopK(Tables(s, dir, "documents"), "doc_id", "text",
        k = 5))
  )

  // one scored CTE column per probe term; score term order matches the
  // Scala reduceLeft (left-associated +)
  private def termScoreSql(term: String): String =
    s"""(((CAST(n AS DOUBLE) - CAST(df_$term AS DOUBLE) + 0.5) / (CAST(df_$term AS DOUBLE) + 0.5))
       | * ((CAST(tf_$term AS DOUBLE) * 2.5)
       |    / (CAST(tf_$term AS DOUBLE) + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))))""".stripMargin

  private val allTerms = probes.flatMap(_.terms).distinct

  // the BM25 scoring CTE chain through `ranked` (all ranks, no k cut)
  // — shared by the bm25_topk oracle and the hybrid_rrf sparse run
  private def bm25RankedCtes: String = {
    val tfCols = allTerms.map(t =>
      s"len(list_filter(t, x -> x = '$t')) AS tf_$t").mkString(",\n         ")
    val dfCols = allTerms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n         ")
    val qScores = probes.map { q =>
      val expr = q.terms.map(termScoreSql).mkString("(", " + ", ")")
      s"SELECT ${q.qId} AS q_id, doc_id, $expr AS score FROM d, stats"
    }.mkString("\n  UNION ALL\n  ")
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents
       |), d AS (
       |  SELECT doc_id, len(t) AS dl,
       |         $tfCols
       |  FROM toks
       |), stats AS (
       |  SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
       |         $dfCols
       |  FROM d
       |), scored AS (
       |  $qScores
       |), ranked AS (
       |  SELECT q_id, doc_id,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rnk
       |  FROM scored WHERE score > 0
       |)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "bm25_topk" ->
      s"""WITH $bm25RankedCtes
         |SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, rnk FROM ranked WHERE rnk <= 10""".stripMargin,

    "hybrid_rrf" ->
      s"""WITH $bm25RankedCtes, sparse AS (
         |  SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, rnk FROM ranked WHERE rnk <= 20
         |), qv AS (
         |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IN (0, 50, 100)
         |), bv AS (
         |  SELECT vec_id AS n_id, embedding::DOUBLE[] AS nv FROM embeddings
         |), dscored AS (
         |  SELECT q_id, n_id,
         |         list_inner_product(v, nv) /
         |           (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(nv, nv))) AS sim
         |  FROM bv, qv WHERE q_id <> n_id
         |), dense0 AS (
         |  SELECT q_id, n_id AS doc_id,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rnk
         |  FROM dscored
         |), dense AS (
         |  SELECT CAST(q_id // 50 + 1 AS BIGINT) AS q_id, doc_id, rnk FROM dense0 WHERE rnk <= 20
         |), fused AS (
         |  SELECT COALESCE(s.q_id, de.q_id) AS q_id,
         |         COALESCE(s.doc_id, de.doc_id) AS doc_id,
         |         COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(s.rnk AS DOUBLE)), CAST(0.0 AS DOUBLE))
         |         + COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(de.rnk AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS score
         |  FROM sparse s FULL OUTER JOIN dense de ON s.q_id = de.q_id AND s.doc_id = de.doc_id
         |), fr AS (
         |  SELECT q_id, doc_id,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rnk
         |  FROM fused
         |)
         |SELECT q_id, doc_id, rnk FROM fr WHERE rnk <= 10""".stripMargin,
    "inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks
        |)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |       array_to_string(list_slice(list_sort(list(doc_id)), 1, 10), ',') AS postings_head
        |FROM dt GROUP BY term""".stripMargin,
    "tfidf_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS term
        |  FROM documents
        |), tfq AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY term
        |), sc AS (
        |  SELECT tfq.doc_id, tfq.term, tfq.tf, dfq.df,
        |         (tfq.tf * 1000000) // dfq.df AS score_fp
        |  FROM tfq JOIN dfq USING (term)
        |)
        |SELECT doc_id, term, tf, df, score_fp, CAST(rnk AS INTEGER) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_fp DESC, term ASC) AS rnk
        |      FROM sc)
        |WHERE rnk <= 5""".stripMargin
  )
}
