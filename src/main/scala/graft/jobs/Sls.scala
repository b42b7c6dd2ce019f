package graft.jobs

/** Scheduler Load Simulator analog (HT/hadoop-sls/ `SLSRunner.java`
  * and its scheduler wrappers): replay a mined job trace against a
  * scheduling POLICY
  * on a fixed slot pool — without running anything — and report what
  * each job would have waited. The reference drives real YARN scheduler
  * code with rumen traces and synthetic NM/AM heartbeats; Spark replaces
  * that scheduler stack, so the analog keeps the part with retained
  * semantics: a deterministic discrete-event simulation of task
  * placement under FIFO vs FAIR sharing, fed by the same [[Rumen]]
  * traces (the reference's own rumen→sls handoff).
  *
  * Entirely driver-side by design — like the reference, it is a
  * simulator of the scheduler, not a data job; input size is the number
  * of JOBS in the trace, not the corpus.
  */
object Sls {

  /** One trace job: `tasks` independent tasks of `taskSec` each,
    * submitted at `submitSec` (relative trace time).
    */
  case class SimJob(name: String, submitSec: Double, tasks: Int,
                    taskSec: Double)

  /** Per-job outcome: first task launch, last task finish, and the
    * scheduling wait (startSec - submitSec).
    */
  case class JobStats(name: String, startSec: Double, finishSec: Double,
                      waitSec: Double)

  sealed trait Policy
  /** Strict submission order: all of an earlier job's tasks place
    * before any later job's (the reference FifoScheduler).
    */
  case object Fifo extends Policy
  /** Least-running-tasks-first instantaneous fair share (the reference
    * FairScheduler's core rule). Running counts tie constantly — on a
    * single slot they are ALWAYS 0-0 at decision time, since finished
    * tasks drain before counting — so ties fall to the job with the
    * least slot-time allocated so far (the original fair scheduler's
    * deficit), then submission order. Without the deficit term the
    * policy degenerates to exact FIFO on every tie.
    */
  case object Fair extends Policy

  /** Simulate `jobs` on `slots` identical task slots under `policy`.
    * Returns per-job stats (trace order) and the makespan (max finish
    * across jobs, zero-task jobs included). Purely deterministic: final
    * ties break on (submitSec, trace index).
    */
  def simulate(jobs: Seq[SimJob], slots: Int,
               policy: Policy): (Seq[JobStats], Double) = {
    require(slots > 0, "need at least one slot")
    require(jobs.forall(j => j.tasks >= 0 && j.taskSec >= 0 && j.submitSec >= 0),
      "negative task count, runtime, or submit time")
    val n = jobs.size
    val remaining = jobs.map(_.tasks).toArray
    val started = Array.fill[Double](n)(Double.NaN)
    val finished = Array.fill[Double](n)(0.0)
    // finish times of in-flight tasks per job, for FAIR's running count
    val inFlight = Array.fill(n)(scala.collection.mutable.Queue.empty[Double])
    // cumulative slot-seconds granted per job: FAIR's deficit tie-break
    val allocSec = Array.fill(n)(0.0)
    val slotFree = scala.collection.mutable.PriorityQueue.fill(slots)(0.0)(
      Ordering[Double].reverse) // min-heap: earliest-free slot first
    var left = remaining.sum
    while (left > 0) {
      var t = slotFree.dequeue()
      val earliestSubmit = jobs.indices.iterator
        .filter(remaining(_) > 0).map(jobs(_).submitSec).min
      if (t < earliestSubmit) t = earliestSubmit
      val runnable = jobs.indices.filter(i =>
        remaining(i) > 0 && jobs(i).submitSec <= t)
      val pick = policy match {
        case Fifo => runnable.minBy(i => (jobs(i).submitSec, i))
        case Fair => runnable.minBy { i =>
          val q = inFlight(i)
          while (q.nonEmpty && q.head <= t) q.dequeue() // completed
          (q.size, allocSec(i), jobs(i).submitSec, i)
        }
      }
      if (started(pick).isNaN) started(pick) = t
      val fin = t + jobs(pick).taskSec
      inFlight(pick) += fin // queue stays sorted: equal taskSec per job
      allocSec(pick) += jobs(pick).taskSec
      finished(pick) = math.max(finished(pick), fin)
      remaining(pick) -= 1
      left -= 1
      slotFree.enqueue(fin)
    }
    val stats = jobs.zipWithIndex.map { case (j, i) =>
      val start = if (started(i).isNaN) j.submitSec else started(i)
      JobStats(j.name, start, math.max(finished(i), start), start - j.submitSec)
    }
    // makespan from the stats themselves, so a zero-task job's (trivial)
    // finish can never exceed the reported makespan
    val makespan = stats.foldLeft(0.0)((m, s) => math.max(m, s.finishSec))
    (stats, makespan)
  }

  /** Shape [[Rumen.jobHistory]] rows into [[SimJob]]s: submit times are
    * offsets from the trace's first submission, task counts and mean
    * task runtimes come straight from the mined metrics. Collects one
    * row per JOB (bounded by the log's job count). Jobs that ran no
    * successful task are dropped — there is nothing to place.
    */
  def fromHistory(history: org.apache.spark.sql.DataFrame): Seq[SimJob] = {
    import org.apache.spark.sql.functions._
    val rows = history
      .filter(col("n_tasks") > 0)
      .select(col("app"), col("job_id"), col("submitted_ms"),
        col("n_tasks"), col("avg_task_sec"))
      .orderBy("app", "job_id")
      .collect()
    if (rows.isEmpty) Seq.empty
    else {
      val t0 = rows.map(_.getLong(2)).min
      rows.toSeq.map(r => SimJob(s"${r.getString(0)}/job_${r.getLong(1)}",
        (r.getLong(2) - t0) / 1e3, r.getLong(3).toInt, r.getDouble(4)))
    }
  }
}
