package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MapFile analog: keyed random access over an immutable dataset.
  *
  * Reference: MapFile — a sorted SequenceFile plus an index permitting
  * `get(key)` (hadoop-common/.../io/MapFile.java:342 Reader, :674 get);
  * the DistributedCache + MapFile.get pattern is the reference's
  * broadcast-join building block.
  *
  * Spark-first: the idiomatic replacement is parquet sorted WITHIN
  * key-hashed files. `sortWithinPartitions` before write gives per-file
  * min/max statistics on the key column, so a `get` (an equality filter)
  * prunes to one file via pushed filters and reads only the matching
  * row groups — the same I/O shape as MapFile's index seek, but with
  * columnar pruning on top.
  */
object MapFileLike {

  /** Write `df` keyed by `key`: `buckets` files, each sorted by key. */
  def write(df: DataFrame, key: String, buckets: Int, path: String): Unit =
    df.repartition(buckets, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(path)

  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Point lookup — an equality filter the scan pushes down. */
  def get(table: DataFrame, key: String, value: Any): DataFrame =
    table.filter(col(key) === lit(value))
}
