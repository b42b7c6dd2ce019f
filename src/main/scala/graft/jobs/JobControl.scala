package graft.jobs

/** JobControl / ControlledJob — the reference's job-DAG runner
  * (mapreduce/lib/jobcontrol/ControlledJob.java:42-56 states,
  * JobControl.java run loop): a job becomes READY when every dependency
  * reached SUCCESS; a FAILED dependency cascades DEPENDENT_FAILED to
  * everything downstream.
  *
  * Spark-first: a "job" is any driver-side action (a write, a collect) —
  * Spark's scheduler handles intra-job parallelism, so this utility only
  * sequences whole jobs by dependency, exactly the altitude the
  * reference's JobControl occupies. Execution order is deterministic
  * (declaration order among ready jobs).
  */
object JobControl {

  sealed trait State
  case object Success extends State
  case object Failed extends State
  case object DependentFailed extends State

  final case class ControlledJob(name: String, deps: Seq[String] = Seq.empty,
                                 run: () => Unit)

  /** Run the DAG; returns each job's terminal state plus the execution
    * order. Throws on unknown dependencies or cycles (both are
    * mis-declared DAGs, not runtime failures).
    */
  def run(jobs: Seq[ControlledJob]): (Map[String, State], Seq[String]) = {
    val byName = jobs.map(j => j.name -> j).toMap
    require(byName.size == jobs.size, "duplicate job names")
    jobs.foreach(j => j.deps.foreach(d =>
      require(byName.contains(d), s"job ${j.name} depends on unknown job $d")))

    val state = scala.collection.mutable.Map[String, State]()
    val order = Seq.newBuilder[String]
    var remaining = jobs
    while (remaining.nonEmpty) {
      val (ready, waiting) = remaining.partition(_.deps.forall(state.contains))
      if (ready.isEmpty)
        throw new IllegalArgumentException(
          s"dependency cycle among: ${waiting.map(_.name).mkString(", ")}")
      ready.foreach { j =>
        if (j.deps.exists(d => state(d) != Success)) {
          state(j.name) = DependentFailed
        } else {
          order += j.name                    // attempted, in dependency order
          state(j.name) =
            try { j.run(); Success }
            catch { case scala.util.control.NonFatal(_) => Failed }
        }
      }
      remaining = waiting
    }
    (state.toMap, order.result())
  }
}
