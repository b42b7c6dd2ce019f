package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-only: run ONE named query like the Bench lane does (clearCache +
  * noop sink after an untimed warmup of the session) and attribute its
  * wall time: per-Spark-job wall ranges, total task time, stage/task
  * counts, and the driver gap (wall − union of job windows ≈ Catalyst
  * analysis/optimization + driver-side work). Guide §1: decide whether
  * a lane is executor-bound, scheduling-bound, or driver-bound before
  * touching it.
  * Usage: runMain graft.ProfileLane <query> [sfDir]
  */
object ProfileLane {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileLane <query> [sfDir]")
    val name = args(0)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, 1000000, 1, 8)
      .selectExpr("sum(id)", "count(distinct id % 100)").collect()
    val fn = SparkEntry.queries(name)
    // warmup run (codegen/JIT), untimed — the Bench protocol
    spark.catalog.clearCache()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    case class J(id: Int, t0: Long, var t1: Long = -1L, var stages: Int = 0,
                 var tasks: Int = 0, var taskMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = J(e.jobId, e.time) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          // attribute stage to the last-started unfinished job (good
          // enough for a single-threaded lane)
          jobs.values.toSeq.sortBy(-_.t0).find(_.t1 < 0).foreach { j =>
            j.stages += 1
            j.tasks += si.numTasks
            j.taskMs += si.taskMetrics.executorRunTime
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val w0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val wallMs = (System.nanoTime() - w0) / 1e6
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let listener drain

    val js = jobs.synchronized(jobs.values.toVector)
    // union of [t0, t1] job windows = time with at least one job running
    val ivs = js.filter(_.t1 > 0).map(j => (j.t0, j.t1)).sortBy(_._1)
    var covered = 0L
    var (cs, ce) = (0L, 0L)
    ivs.foreach { case (a, b) =>
      if (a > ce) { covered += ce - cs; cs = a; ce = b }
      else if (b > ce) ce = b
    }
    covered += ce - cs
    println(f"[profile] $name wall=${wallMs / 1000}%.3f s jobs=${js.size} " +
      f"jobWindow=${covered / 1000.0}%.3f s driverGap=${(wallMs - covered) / 1000}%.3f s " +
      f"stages=${js.map(_.stages).sum} tasks=${js.map(_.tasks).sum} " +
      f"taskTime=${js.map(_.taskMs).sum / 1000.0}%.3f s")
    js.sortBy(j => -(j.t1 - j.t0)).take(25).foreach { j =>
      println(f"[profile]   job ${j.id}%4d ${(j.t1 - j.t0) / 1000.0}%8.3f s " +
        f"stages=${j.stages}%3d tasks=${j.tasks}%5d taskTime=${j.taskMs / 1000.0}%8.3f s")
    }
    spark.stop()
  }
}
