package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hadoop Streaming analog: run each partition's records through an
  * external executable via stdin/stdout.
  *
  * Reference: StreamJob/PipeMapper/PipeReducer
  * (hadoop-tools/hadoop-streaming/.../StreamJob.java:80, PipeMapRed.java)
  * fork the user command per task and frame records as `key \t value \n`
  * lines. Spark's `RDD.pipe` is the exact same contract — one child
  * process per partition, line framing — so the operator is a thin
  * DataFrame adapter around it. Per-partition process fan-out scales
  * with the cluster exactly like the reference's per-task fork.
  */
object Pipe {

  /** Pipe selected columns (tab-joined, reference framing) through `cmd`;
    * returns one `line: string` row per stdout line.
    */
  def apply(df: DataFrame, cmd: Seq[String], cols: Column*): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.select(concat_ws("\t", cols: _*).as("line"))
      .as[String].rdd.pipe(cmd)
    spark.createDataset(lines).toDF("line")
  }
}
