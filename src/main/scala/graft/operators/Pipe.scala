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

  /** The streaming key-field output configs
    * (`stream.map.output.field.separator` +
    * `stream.num.map.output.key.fields`, PipeMapRed.java:120-140): the
    * child's stdout line splits at the numKeyFields-th separator into
    * (key, value) — the frame the reference's shuffle then sorts on.
    */
  def keyed(df: DataFrame, cmd: Seq[String], sep: String,
            numKeyFields: Int, cols: Column*): DataFrame = {
    val arr = split(col("line"), java.util.regex.Pattern.quote(sep))
    apply(df, cmd, cols: _*).select(
      concat_ws(sep, slice(arr, 1, numKeyFields)).as("key"),
      concat_ws(sep, slice(arr, lit(numKeyFields + 1),
        greatest(size(arr) - numKeyFields, lit(0)))).as("value"))
  }
}
