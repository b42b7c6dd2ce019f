package graft

import graft.jobs.TeraSort

/** Dev-only scratch main for plan inspection and micro-timing. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("terasort 10M cold") {
      val sorted = TeraSort.teraSort(TeraSort.teraGen(spark, 10000000L, 32), 32)
      TeraSort.teraValidate(sorted)
    }
    time("terasort 10M warm") {
      val sorted = TeraSort.teraSort(TeraSort.teraGen(spark, 10000000L, 32), 32)
      TeraSort.teraValidate(sorted)
    }
    time("teragen only") {
      TeraSort.teraGen(spark, 10000000L, 32).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
