package graft.operators

import org.apache.spark.sql.DataFrame

/** Minimum-parallelism guard for compute-dense single-pass kernels
  * (media decode, the PCA co-moment pass): when the input arrives in
  * FEWER partitions than the session's core count — the local
  * single-row-group parquet case, where a sub-128 MB file is one scan
  * partition no matter how many cores the box has — fan it out so the
  * kernel uses the machine. At scale inputs already exceed the core
  * count and this is the identity: no shuffle is ever added to an
  * adequately partitioned frame (guide §2: make partitioning
  * scale-adaptive, not a constant tuned for either local mode or the
  * cluster).
  */
private[graft] object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
