package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset-shaping operators for training-data pipelines.
  *
  * The reference samples via InputSampler (Random/Split/IntervalSampler,
  * mapreduce/lib/partition/InputSampler.java:58-230), whose output
  * depends on split layout and RNG seed. These are the Spark-scale forms
  * with a stronger property: the result is a pure FUNCTION of the data
  * (hash-ranked / hash-sharded), so any cluster, partitioning, or retry
  * reproduces it bit-for-bit — and a SQL oracle can replay it.
  */
object Sampling {

  /** 52-bit hash key: exactly representable as a Double (TopKByScore
    * scores are doubles) and replayable in SQL as
    * `('0x' || substring(md5(...), 1, 13))::BIGINT`.
    */
  def hashKey(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 13), 16, 10).cast("long")

  /** The `k` rows per stratum whose md5(id) ranks lowest — a
    * deterministic per-stratum sample of fixed size. Ranking runs
    * through the bounded [[graft.functions.Aggregators.TopKByScore]]
    * aggregator: map-side partials keep ≤k rows per (partition,
    * stratum), so the shuffle carries k·partitions rows per stratum,
    * never a stratum's full membership to one task (the
    * `row_number() OVER (PARTITION BY stratum)` anti-pattern — the
    * ORACLE uses that window; this plan must not, see PlanSpec).
    * Hash ties (52-bit, ~n²/2⁵³ odds) break toward the lower id on
    * both sides.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       k: Int): DataFrame =
    df.select(col(strataCol), col(idCol).cast("long").as(idCol),
      hashKey(col(idCol)).as("hk"))
      .groupBy(col(strataCol))
      .agg(graft.functions.Aggregators.topKByScore(
        -col("hk").cast("double"), col(idCol), k).as("ids"))
      .select(col(strataCol), explode(col("ids")).as(idCol))

  /** Sequential sequence-packing: within each (stratum, hash-shard),
    * documents in `orderCol` order accumulate into packs of at most
    * `budget` tokens (exclusive prefix sum / budget). Packing is
    * order-DEFINED, so each unit is sequential by nature; `shards`
    * bounds the sequential unit — at 100 TB you raise shards so a
    * stratum's packing parallelizes, at the cost of packs never
    * crossing shard boundaries (the standard corpus-sharding trade).
    * Returns one row per pack: (stratum, shard, pack_id, n_docs,
    * tok_sum).
    */
  def packBySize(df: DataFrame, strataCol: String, orderCol: String,
                 tokenCol: Column, budget: Int, shards: Int): DataFrame = {
    val shard = pmod(hashKey(col(orderCol)), lit(shards.toLong)).as("shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("shard")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(strataCol), col(orderCol), tokenCol.cast("long").as("toks"), shard)
      .withColumn("prior", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("prior") / budget))
      .groupBy(col(strataCol), col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tok_sum"))
  }
}
