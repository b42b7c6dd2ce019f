package graft

import org.apache.spark.sql.SparkSession

/** One place for session construction so Verify, Bench and tests share
  * the same scale-oriented defaults.
  */
object GraftSession {

  /** local[n] session. At 100 TB the same settings translate to: AQE on
    * (runtime skew-join + partition coalescing), shuffle partitions sized
    * to the cluster (here: the local core count, not the 200 default).
    */
  def build(cores: String, extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS,false), which Spark 4
      // rejects by default; read as long nanos and convert in Tables
      // (DuckDB's oracle likewise truncates ns -> us).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Driver-generated parquet may carry isAdjustedToUTC=false micros,
      // which Spark 4 infers as TIMESTAMP_NTZ — a type unix_micros/
      // withWatermark reject. The session is pinned UTC, so reading NTZ
      // as TIMESTAMP is value-identity; keep the engine on one ts type.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
