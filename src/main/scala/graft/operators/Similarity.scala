package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — scale extension (SURVEY §7.5).
  *
  * Numeric discipline: elements are upcast to double BEFORE multiplying
  * and accumulated left-to-right (`aggregate` fold), which is bit-equal
  * to the oracle's DOUBLE[] inner product — so ranks (and ties) agree.
  */
object Similarity {

  /** Double-precision dot product: the codegen'd DotProduct expression
    * (graft.functions.VectorExpressions) — bit-equal to [[dotFold]] and
    * to the oracle's sequential DOUBLE[] inner product, but a primitive
    * loop instead of a per-element lambda.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  /** Reference implementation via higher-order functions (interpreted;
    * kept for environments without GraftExtensions registered).
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    *
    * The query side is broadcast (it is the small side by construction),
    * so the base table streams once with no shuffle; ranking shuffles
    * only (q, n, sim) triples by query id. At 100 TB the base scan is
    * embarrassingly parallel; for sublinear scans see [[ivfTopK]].
    */
  def bruteForceTopK(base: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val b = base.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val scored = b.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"))
  }

  /** Embedding-cosine near-dup pairs: all (a < b) pairs with cosine
    * above `threshold` (or the global top-k most similar when the data
    * has no near-dups). Brute-force pair enumeration — at scale, block
    * first with [[ivfTopK]]-style cells and compare within cells.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b")
  }

  def topCosinePairs(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .orderBy(col("sim").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(k)
      .select("vec_a", "vec_b")
  }

  /** IVF-style ANN: assign every vector to its nearest of `nCells`
    * deterministic anchor vectors (anchors = the vectors whose id hashes
    * lowest — a seedless, reproducible "coarse codebook"), then search
    * only the query's `nProbe` closest cells. Trades recall for a
    * 1/(nCells/nProbe) scan reduction — the 100 TB path.
    */
  def ivfTopK(base: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nCells: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val anchors = base
      .select(col(idCol).as("a_id"), col(vecCol).as("av"))
      .withColumn("hk", md5(col("a_id").cast("string")))
      .orderBy("hk").limit(nCells)
      .drop("hk")
    val b = base.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val assignW = Window.partitionBy("n_id").orderBy(col("asim").desc, col("a_id").asc)
    val assigned = b.join(broadcast(anchors), col("n_id").isNotNull)
      .withColumn("asim", cosine(col("nv"), col("av")))
      .withColumn("ar", row_number().over(assignW))
      .filter(col("ar") === 1)
      .select(col("n_id"), col("nv"), col("a_id").as("cell"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy("q_id").orderBy(col("asim").desc, col("a_id").asc)
    val probes = q.join(broadcast(anchors), col("q_id").isNotNull)
      .withColumn("asim", cosine(col("qv"), col("av")))
      .withColumn("ar", row_number().over(probeW))
      .filter(col("ar") <= nProbe)
      .select(col("q_id"), col("qv"), col("a_id").as("cell"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    assigned.join(probes, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"))
  }
}
