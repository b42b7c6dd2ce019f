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
        s"\nSELECT node, CAST(pr AS BIGINT) AS pr FROM p$Iters")
  )
}
