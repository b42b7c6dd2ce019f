package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** ANN over the `embeddings` table. Query set = every 50th vector; the
  * oracle replays the identical double-precision sequential dot product
  * (see Similarity scaladoc), so ranks agree exactly; only (q, n, rank)
  * triples are emitted — similarity doubles stay internal.
  */
object SimilarityQueries extends QueryModule {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> ((s, dir) => {
      val base = emb(s, dir)
      val queries = base.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(base, queries, "vec_id", "embedding", k = 5)
    }),
    // IVF path: deterministic but approximate — rows-only driver check;
    // recall vs brute force is asserted in the ScalaTest spec.
    "ann_ivf_topk" -> ((s, dir) => {
      val base = emb(s, dir)
      val queries = base.filter(col("vec_id") % 50 === 0)
      // nCells/nProbe auto-sized from the base row count (sqrt scaling)
      Similarity.ivfTopK(base, queries, "vec_id", "embedding", k = 5)
    }),
    // Embedding-cosine near-dup (scale extension): the fixture has no
    // planted vector dups, so the demo is top-20 most-similar pairs
    // over a deterministic subset; thresholded pairs via
    // Similarity.cosinePairs share the same code path.
    "dedup_embedding" -> ((s, dir) => {
      Similarity.topCosinePairs(
        emb(s, dir).filter(col("vec_id") % 10 === 0), "vec_id", "embedding", 20)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "ann_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 50 = 0
        |), b AS (
        |  SELECT vec_id AS n_id, embedding::DOUBLE[] AS nv FROM embeddings
        |), scored AS (
        |  SELECT q_id, n_id,
        |         list_inner_product(qv, nv) /
        |           (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(nv, nv))) AS sim
        |  FROM b, q WHERE q_id <> n_id
        |), ranked AS (
        |  SELECT q_id, n_id,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS INTEGER) AS rnk
        |  FROM scored
        |)
        |SELECT q_id, n_id, rnk FROM ranked WHERE rnk <= 5""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 10 = 0
        |), p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         list_inner_product(a.v, b.v) /
        |           (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |)
        |SELECT vec_a, vec_b FROM p ORDER BY sim DESC, vec_a, vec_b LIMIT 20""".stripMargin
  )
}
