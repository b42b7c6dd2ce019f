package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Top principal component of an embedding column — the
  * decorrelation/whitening monitor (and the "all-but-the-top"
  * postprocessing direction) an embedding pipeline tracks at corpus
  * scale: a dominant component with outsized eigenvalue flags a
  * miscalibrated encoder, and removing it is the standard embedding
  * cleanup.
  *
  * Scale extension — no reference counterpart (SURVEY §7.5). Shape:
  * ONE distributed pass accumulates the exact-integer moment sums of
  * the 1e-6-quantized components — n, per-dim sums s_i, and the 2080
  * upper-triangle co-moments p_ij = Σ q_i·q_j — via a row-local pair
  * explode feeding a map-side-combined aggregation (the shuffle carries
  * ≤ 2080 partials per map task, never a vector). The collected moment
  * table is a BOUNDED artifact (dim·(dim+3)/2 longs, like the k-means
  * codebook), and the 30-step power iteration on the 64×64 covariance
  * runs driver-side in microseconds.
  *
  * Determinism: sums are exact integers (order-independent) — the
  * co-moments accumulate as decimal(38,0), good to ~10²⁶ unit-range
  * rows, and the per-dim sums as BIGINT (|Σq_i| < 2⁶³ up to ~10¹²
  * rows); the covariance entries c_ij = p_ij/n − (s_i/n)(s_j/n) and
  * the iteration (sequential dot products, sqrt, divide — no FMA: JVM
  * floats are strict IEEE since Java 17) use a fixed operation
  * sequence, so a SQL engine replaying the same sequence reproduces
  * every double bit-for-bit. Exactness caveat: the exact-integer →
  * double conversion is itself exact while sums stay below 2^53 (any
  * fixture); past that the sums REMAIN exact and the conversion
  * correctly rounds — the component is equally valid, the cross-engine
  * bit-replay guarantee is what needs the fixture bound.
  */
object Pca {

  /** (dim, mean_q, loading, lambda) per dimension: the quantized mean,
    * the unit top-eigenvector coordinate, and the shared Rayleigh-style
    * eigenvalue estimate (the last iteration's pre-normalization norm).
    */
  def topComponent(df: DataFrame, vecCol: String, dim: Int,
                   iters: Int = 30): DataFrame = {
    val spark = df.sparkSession
    // the pair explode amplifies every row 2080× into the aggregation —
    // fan a under-partitioned input out to the core count first
    // (identity on any adequately partitioned table; Par.fanOut)
    val q = Par.fanOut(df.select(transform(col(vecCol),
      x => round(x.cast("double") * 1000000).cast("long")).as("q")))
    // row-local upper-triangle pair products; the explode feeds a
    // map-side-combined sum, so the shuffle is 2080 rows per task
    // decimal(38,0) accumulation (the dimStats sum_sq discipline): a
    // per-row product reaches ~1e12 on 1e-6-quantized unit-range
    // components, so a plain LongType sum would silently wrap past 2^63
    // at ~10^7 full-magnitude rows — decimal(38,0) keeps the co-moments
    // exact to 10^26 rows. (The per-row product itself stays in Long:
    // |q_i·q_j| ≤ (1e6·max|x|)² needs max|x| < ~3e3, the same bound the
    // quantization already assumes.)
    val pairs = q.select(explode(expr(
      s"""flatten(transform(sequence(0, ${dim - 1}), i ->
         |  transform(sequence(i, ${dim - 1}), j ->
         |    struct(i, j, q[i] * q[j] AS pq))))""".stripMargin)).as("e"))
      .groupBy(col("e.i"), col("e.j"))
      .agg(sum(col("e.pq").cast("decimal(38,0)")).as("p"))
    val dims = q.select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy(col("i"))
      .agg(sum(col("qi")).as("s"), count(lit(1)).as("n"))
    // bounded artifacts: dim rows + dim(dim+1)/2 rows. Fail fast on a
    // malformed corpus (empty input, or vectors shorter than `dim`,
    // whose missing coordinates would otherwise silently drop from the
    // sums and skew the component).
    val dRows = dims.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    require(dRows.size == dim,
      s"expected $dim populated dimensions, found ${dRows.size} — " +
        "empty input or vectors shorter than dim")
    require(dRows.values.map(_._2).toSet.size == 1,
      "ragged vector lengths: per-dimension counts disagree")
    val n = dRows.head._2._2.toDouble
    val s = Array.tabulate(dim)(i => dRows(i)._1.toDouble)
    val c = Array.ofDim[Double](dim, dim)
    pairs.collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      // exact decimal -> nearest double, the same correctly-rounded
      // conversion DuckDB's HUGEINT-sum -> DOUBLE cast performs
      val p = r.getDecimal(2).doubleValue
      val v = p / n - (s(i) / n) * (s(j) / n)
      c(i)(j) = v
      c(j)(i) = v
    }
    // power iteration from the exact unit start 1/sqrt(dim); every dot
    // is a sequential ascending-index loop (list_inner_product's order)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      var nrm = 0.0
      var i = 0
      while (i < dim) { nrm += w(i) * w(i); i += 1 }
      lambda = math.sqrt(nrm)
      v = w.map(_ / lambda)
      t += 1
    }
    val out = (0 until dim).map(i =>
      Row(i.toLong, s(i) / n, v(i), lambda))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("dim", LongType, nullable = false),
        StructField("mean_q", DoubleType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("lambda", DoubleType, nullable = false))))
  }

  /** All-but-the-top application: project the fitted top component out
    * of every vector (x' = x − (v·x)v — Mu & Viswanath 2018, the
    * standard embedding postprocessing). `v` is the `loading` column of
    * [[topComponent]] in dim order — a 64-double artifact riding into
    * the plan as a broadcast literal, so the apply is a ROW-LOCAL
    * codegen'd projection: fit once, stream the corpus through, no
    * shuffle at any scale (the IVF index/probe split, for PCA).
    * The projection is computed once per row (its own select), then the
    * residual re-quantizes at 1e-6 into the qcodes string carrier —
    * every op (sequential dot, per-element multiply/subtract, round)
    * has a fixed IEEE order, so the oracle replays rows bit-for-bit.
    */
  def removeTop(df: DataFrame, idCol: String, vecCol: String,
                v: Seq[Double]): DataFrame = {
    require(v.nonEmpty, "empty component — fit topComponent first")
    val vlit = array(v.map(lit): _*)
    df.select(col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("x"))
      .select(col(idCol), col("x"),
        Similarity.dot(col("x"), vlit).as("proj"))
      .select(col(idCol), col("proj"),
        concat_ws(",",
          zip_with(col("x"), vlit,
            (a, b) => round((a - col("proj") * b) * 1000000).cast("long"))
            .cast("array<string>")).as("resid_q"))
  }
}
