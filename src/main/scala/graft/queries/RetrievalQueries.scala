package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.Retrieval
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
        k = 10))
  )

  // one scored CTE column per probe term; score term order matches the
  // Scala reduceLeft (left-associated +)
  private def termScoreSql(term: String): String =
    s"""(((CAST(n AS DOUBLE) - CAST(df_$term AS DOUBLE) + 0.5) / (CAST(df_$term AS DOUBLE) + 0.5))
       | * ((CAST(tf_$term AS DOUBLE) * 2.5)
       |    / (CAST(tf_$term AS DOUBLE) + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))))""".stripMargin

  private val allTerms = probes.flatMap(_.terms).distinct

  def oracleSql: Map[String, String] = Map(
    "bm25_topk" -> {
      val tfCols = allTerms.map(t =>
        s"len(list_filter(t, x -> x = '$t')) AS tf_$t").mkString(",\n         ")
      val dfCols = allTerms.map(t =>
        s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n         ")
      val qScores = probes.map { q =>
        val expr = q.terms.map(termScoreSql).mkString("(", " + ", ")")
        s"SELECT ${q.qId} AS q_id, doc_id, $expr AS score FROM d, stats"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH toks AS (
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
         |)
         |SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, rnk FROM ranked WHERE rnk <= 10""".stripMargin
    },
    "inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks
        |)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |       array_to_string(list_slice(list_sort(list(doc_id)), 1, 10), ',') AS postings_head
        |FROM dt GROUP BY term""".stripMargin
  )
}
