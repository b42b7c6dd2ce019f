package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * The reference has no skew handling (SURVEY §4: "absent"); at 100 TB a
  * single hot key turns a shuffle join into one straggler task. Two
  * tools here, complementing AQE's runtime skew-join splitting:
  *
  * Salted join: replicate the SMALL side `salt` times and scatter the
  * big side's rows uniformly across the replicas — the hot key's rows
  * spread over `salt` tasks. Equivalent rows, one extra narrow column.
  */
object Skew {

  /** Inner equi-join big⋈small on `key`, with the big side salted into
    * `salt` buckets. `small` must be join-unique on `key` or result
    * multiplicity is unchanged anyway (each small row is replicated once
    * per bucket, and each big row matches exactly its own bucket).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val smallS = small.crossJoin(
      big.sparkSession.range(salt).select(col("id").cast("int").as("__salt")))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
