package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Multi-way output routing.
  *
  * Reference: MultipleOutputs (mapreduce/lib/output/MultipleOutputs.java:175,308,409)
  * lets one reducer write named side outputs and per-record base paths;
  * MultipleTextOutputFormat (mapred/lib/MultipleOutputFormat.java:56,144)
  * routes each record to a file named from the key.
  *
  * Spark-first: per-record routing by a column value IS
  * `write.partitionBy` — one pass, one job, files laid out by key, and
  * at read time the layout doubles as partition pruning. Named side
  * outputs with arbitrary predicates map to filtered writes; the input
  * should be cached by the caller if the routes overlap heavily.
  */
object MultiOutput {

  /** Per-record routing by column value (MultipleTextOutputFormat). */
  def byColumn(df: DataFrame, column: String, path: String): Unit =
    df.write.partitionBy(column).mode("overwrite").parquet(path)

  /** Named side outputs (MultipleOutputs.write(name, ...)): each route
    * filters the input and lands under `path/<name>`.
    */
  def named(df: DataFrame, routes: Map[String, Column], path: String): Unit =
    routes.foreach { case (name, pred) =>
      df.filter(pred).write.mode("overwrite").parquet(s"$path/$name")
    }
}
