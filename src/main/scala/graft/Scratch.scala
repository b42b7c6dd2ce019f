package graft

/** Dev-only scratch main: simulates the driver's smoke test — a BARE
  * SparkSession (no GraftSession defaults) calling SparkEntry.entry.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.entry(spark).count()
    println(s"[scratch] entry rows=$rows")
    require(rows > 0)
    // a query that needs the nanos conf + one that needs dot_product,
    // both under the bare session (Tables.ensure must self-heal)
    val s1 = SparkEntry.queries("sessionize")(spark, "/root/testdata/sf0.001").count()
    val s2 = SparkEntry.queries("ann_cosine_topk")(spark, "/root/testdata/sf0.001").count()
    println(s"[scratch] bare-session sessionize=$s1 ann=$s2")
    spark.stop()
  }
}
