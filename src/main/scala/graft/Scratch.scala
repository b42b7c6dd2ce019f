package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{KeyFieldSpec, TotalOrderSort}

/** Dev-only scratch main for plan inspection and micro-timing. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val dir = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li = Tables(spark, dir, "lineitem")
    val line = concat_ws(" ",
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast("string"),
      col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string"))
    val df = li.select(line.as("line"))
    val arr = split(col("line"), " ")
    val sortCols = KeyFieldSpec.sortColumns(arr, "-k1,1 -k3,3nr -k4,4n -k5,5n -k2,2", " ")

    // materialized keys: project once, sort plain attributes
    val keyVals = KeyFieldSpec.parse("-k1,1 -k3,3nr -k4,4n -k5,5n -k2,2")
      .map(k => (KeyFieldSpec.keyValue(arr, k, " "), k.reverse))
    val named = keyVals.zipWithIndex.map { case ((c, _), i) => c.as(s"__sk$i") }
    val plainSort = keyVals.zipWithIndex.map { case ((_, rev), i) =>
      if (rev) col(s"__sk$i").desc else col(s"__sk$i").asc }
    val wide = df.select((col("line") +: named): _*)
    df.count()  // warm
    time("orderBy exprs (per-comparison eval)")(
      df.orderBy(sortCols: _*).write.mode("overwrite").format("noop").save())
    time("orderBy materialized keys")(
      wide.orderBy(plainSort: _*).write.mode("overwrite").format("noop").save())
    time("withRank materialized")(
      TotalOrderSort.withRank(wide, 32, "rnk", plainSort: _*).count())

    def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    val one = expr("CAST(1 AS DECIMAL(3,2))")
    time("q1 decimal sums")(
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)),
          sum(dec2(col("l_extendedprice"))).cast(DecimalType(38, 2)),
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
            .cast(DecimalType(38, 4)),
          count(lit(1))).write.mode("overwrite").format("noop").save())
    time("q1 fixed-point long sums")(
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(expr("cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)")),
          sum(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")),
          sum(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint) * (100 - cast(cast(l_discount as decimal(18,2)) * 100 as bigint))")),
          count(lit(1))).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
