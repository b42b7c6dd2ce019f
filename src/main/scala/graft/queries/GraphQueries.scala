package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graphs

/** Link-graph authority scoring over `documents` (operators/Graphs).
  * The fixture corpus has no real hyperlinks, so the citation graph is
  * SYNTHESIZED deterministically (the CleanQueries damage discipline):
  * each document's source cites a domain derived from its doc_id, and
  * that domain cites a second derived domain — sources ∪ domains form
  * the node set. The oracle replays the identical edge derivation and
  * unrolls the integer PageRank rounds as CTEs; because every quantity
  * is a long and integer sums are order-independent, both engines agree
  * bit-for-bit (see Graphs.pageRankInt scaladoc).
  */
object GraphQueries extends QueryModule {

  private val Iters = 3
  private val Scale = 1000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank_domains" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val dom = concat(lit("d"), (col("doc_id") % 17).cast("string"))
      val dom2 = concat(lit("d"), ((col("doc_id") * 7 + 3) % 17).cast("string"))
      val edges = d.select(col("source").as("src"), dom.as("dst"))
        .union(d.select(dom.as("src"), dom2.as("dst")))
      Graphs.pageRankInt(edges, "src", "dst", iters = Iters, scale = Scale)
    }),

    // Per-vertex triangle counts (the clustering-coefficient numerator
    // / community-density signal) over a deterministically synthesized
    // link graph — two modular-arithmetic edge families per doc on a
    // 101-node id space, dense enough that triangles are the common
    // case. Engine orients edges by (degree, id) so wedge generation
    // is hub-proof (see Graphs.triangleCounts); the oracle counts the
    // same orientation-independent triangle set with the naive
    // u<v<w three-way join.
    "triangle_counts" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val e1 = d.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * 13 + 5) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 7 + 2) % 101).as("src"),
        ((col("doc_id") * 29 + 11) % 101).as("dst"))
      Graphs.triangleCounts(e1.union(e2), "src", "dst")
    })
  )

  // one (contrib, rank) CTE pair per unrolled round; DuckDB widens
  // SUM(BIGINT) to HUGEINT, which the final CAST narrows back — all
  // intermediate arithmetic is exact integers on both engines
  private def roundCtes(i: Int): String = {
    val prev = if (i == 1) "p0" else s"p${i - 1}"
    s"""c$i AS (
       |  SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS s
       |  FROM e JOIN $prev p ON p.node = e.src JOIN deg d ON d.src = e.src
       |  GROUP BY e.dst
       |), p$i AS (
       |  SELECT n.node, ${(15L * Scale) / 100L} + (85 * COALESCE(c$i.s, 0)) // 100 AS pr
       |  FROM n LEFT JOIN c$i USING (node)
       |)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "pagerank_domains" -> (
      s"""WITH e AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT source AS src, 'd' || CAST(doc_id % 17 AS VARCHAR) AS dst
         |    FROM documents
         |    UNION ALL
         |    SELECT 'd' || CAST(doc_id % 17 AS VARCHAR) AS src,
         |           'd' || CAST((doc_id * 7 + 3) % 17 AS VARCHAR) AS dst
         |    FROM documents
         |  )
         |), n AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e
         |  )
         |), deg AS (
         |  SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src
         |), p0 AS (
         |  SELECT node, CAST($Scale AS BIGINT) AS pr FROM n
         |), """.stripMargin +
        (1 to Iters).map(roundCtes).mkString(",\n") +
        s"\nSELECT node, CAST(pr AS BIGINT) AS pr FROM p$Iters"),
    "triangle_counts" ->
      """WITH raw AS (
        |  SELECT doc_id % 101 AS s, (doc_id * 13 + 5) % 101 AS t FROM documents
        |  UNION ALL
        |  SELECT (doc_id * 7 + 2) % 101, (doc_id * 29 + 11) % 101 FROM documents
        |), e AS (
        |  SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v
        |  FROM raw WHERE s <> t
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |)
        |SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS n_tri
        |FROM (SELECT unnest([a, b, c]) AS node FROM tri)
        |GROUP BY node""".stripMargin
  )
}
