package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * The reference engine's "table" is an HDFS directory of K/V part files
  * (reference: hadoop-common-project/hadoop-common/src/main/java/org/apache/hadoop/fs/FileSystem.java:89);
  * here a table is a parquet path read through the columnar scan so filter
  * pushdown and column pruning apply.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Queries must work under ANY caller-provided session (the driver may
  // not build it through GraftSession): idempotently apply the session
  // requirements — nanos-as-long for events.parquet and the dot_product
  // function registration — the first time a session reaches us.
  private val ensured =
    java.util.Collections.synchronizedSet(new java.util.HashSet[SparkSession]())

  def ensure(spark: SparkSession): Unit =
    if (ensured.add(spark)) {
      scala.util.Try(
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))
      // Driver-built sessions may not come through GraftSession: force
      // isAdjustedToUTC=false parquet micros to read as TIMESTAMP (the
      // session is pinned UTC, so the values are identical) rather than
      // TIMESTAMP_NTZ, which unix_micros/withWatermark reject.
      scala.util.Try(
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false"))
      scala.util.Try(
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "dot_product",
          exprs => graft.functions.DotProduct(exprs(0), exprs(1)),
          "scala_udf"))
      scala.util.Try(
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "nearest_cells",
          exprs => graft.functions.NearestCells(exprs(0), exprs(1), exprs(2)),
          "scala_udf"))
      scala.util.Try(
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "nearest_centroid_l2",
          exprs => graft.functions.NearestCentroidL2(exprs(0), exprs(1)),
          "scala_udf"))
      scala.util.Try(
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "nfc_normalize",
          exprs => graft.functions.NfcNormalize(exprs.head),
          "scala_udf"))
      scala.util.Try(
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "deflated_size",
          exprs => graft.functions.DeflatedSize(exprs.head),
          "scala_udf"))
      scala.util.Try(
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "ahash64",
          exprs => graft.functions.AHash64(exprs.head),
          "scala_udf"))
      scala.util.Try(
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "multi_match_counts",
          exprs => graft.functions.MultiMatchCounts(exprs(0), exprs(1)),
          "scala_udf"))
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): with
    // spark.sql.legacy.parquet.nanosAsLong it arrives as long nanos;
    // truncate to a microsecond timestamp exactly like DuckDB reads it.
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize the `ts` column to TimestampType regardless of how the
    * parquet annotated it: long nanos (nanosAsLong sessions) truncate to
    * micros; TIMESTAMP_NTZ (inferTimestampNTZ sessions) casts — the
    * session is pinned UTC so NTZ→LTZ is value-identity.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(TimestampType))
      case _ => df
    }
  }
}
