package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation (scale extension — no
  * reference counterpart, SURVEY §7.5): domain/source authority scoring
  * drives crawl prioritization and per-domain sampling weights in
  * web-scale training pipelines (the role harmonic centrality plays in
  * Common Crawl's domain ranking; Page et al. 1999 for PageRank itself).
  * Near-dup clustering's iterative sibling lives in
  * [[Dedup.connectedComponents]]; this file holds the weighted-walk side.
  */
object Graphs {

  /** FIXED-POINT integer PageRank: every quantity is a long (node mass
    * starts at `scale`; one round does contrib = pr div outdeg per edge,
    * then pr' = (15·scale) div 100 + (85·Σ contrib) div 100). Integer
    * sums are order-independent, so — unlike the float formulation,
    * whose Σ depends on reduction order — results are bit-identical
    * across partitionings, retries, AND engines: the DuckDB oracle
    * replays the rounds with `//` and hash-matches exactly. The price is
    * truncation (up to outdeg units of mass per node per round vanish,
    * as does all mass reaching rank sinks — the standard
    * drop-dangling-mass variant): ranks are ORDINAL authority scores,
    * not a probability distribution, which is all corpus curation uses
    * them for.
    *
    * Scale shape: one equi-join (edges × current ranks, shuffling 8-byte
    * masses) and one map-side-combined sum per round — the CC cost
    * model; `iters` is small and fixed (authority scores converge
    * ordinally in a handful of rounds; 3–10 is the working range). The
    * plan is left UNROLLED for small `iters` so Catalyst sees one
    * declarative tree; for `iters` ≳ 8 pass `checkpointEvery` > 0 to
    * truncate lineage, and on a cluster pass `checkpointDir` to use
    * reliable-storage checkpoints (same trade as connectedComponents).
    *
    * Overflow bound: Σ contrib at one node < total mass ≤ |V|·scale, and
    * the update multiplies by 85 — keep |V|·scale·85 < 2⁶³ (at the
    * default scale=10⁶, good to ~10¹¹ nodes).
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int, scale: Long = 1000000L,
                  checkpointEvery: Int = 0,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(scale >= 100L, "scale below 100 truncates the damping terms to 0")
    // lineage-truncation fault-tolerance trade: see Checkpoints
    val ckpt = Checkpoints.maker(checkpointDir)
    // The three per-round invariants are materialized ONCE (eager
    // checkpoint): without this every iteration re-scans the raw
    // edge table and re-runs its distinct — linear-in-iters source I/O,
    // the wrong slope at 100 TB. After the checkpoint each round joins
    // executor-resident blocks only.
    val e = ckpt(edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct())
    val nodes = ckpt(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val deg = ckpt(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    val baseAdd = (15L * scale) / 100L
    var pr = nodes.withColumn("pr", lit(scale))
    for (i <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
      val inSum = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      pr = nodes.join(inSum, Seq("node"), "left")
        .select(col("node"),
          (lit(baseAdd) + expr("85 * coalesce(s, 0L) div 100")).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        pr = ckpt(pr)
    }
    pr
  }
}
