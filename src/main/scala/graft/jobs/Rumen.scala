package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rumen analog (HT/hadoop-rumen/ `TraceBuilder.java`, `JobBuilder.java`:
  * parse job history into replayable traces).
  *
  * The reference mines Hadoop JobHistory (.jhist) files into `LoggedJob`
  * JSON that GridMix and the sls simulator replay. Spark's equivalent
  * history artifact is the event log (`spark.eventLog.enabled` — one
  * JSON `SparkListenerEvent` per line, the same stream the History
  * Server reads), so the analog parses THAT: [[jobHistory]] aggregates
  * an event-log directory into one row per (application log file, job),
  * and [[toTrace]] shapes those rows into the [[LoadGen.TraceJob]] mix
  * that [[LoadGen.replayTrace]] (GridMix-lite) replays.
  *
  * Scale shape: the raw text is scanned ONCE — a cheap substring
  * pre-filter keeps only the three event types, one `from_json` against
  * an explicit combined schema parses them (absent fields → null, no
  * `read.json` inference pass, no failure when a log never populated
  * some nested metric), and the parsed rows (two per job plus one per
  * task — a tiny fixed-width fraction of the log) are materialized via
  * `localCheckpoint` so the downstream lanes don't rescan the text.
  * Reduction is two hash aggregations (tasks→stage, stage→job) plus a
  * join on the stage→job map; only the final per-JOB rows (bounded by
  * the log's job count, not its task count) ever reach the driver, in
  * [[toTrace]].
  */
object Rumen {

  private val eventSchema = StructType(Seq(
    StructField("Event", StringType),
    StructField("Job ID", LongType),
    StructField("Submission Time", LongType),
    StructField("Completion Time", LongType),
    StructField("Stage IDs", ArrayType(LongType)),
    StructField("Stage ID", LongType),
    StructField("Stage Attempt ID", LongType),
    StructField("Task End Reason", StructType(Seq(
      StructField("Reason", StringType)))),
    StructField("Task Info", StructType(Seq(
      StructField("Task ID", LongType),
      StructField("Index", LongType),
      StructField("Attempt", LongType),
      StructField("Launch Time", LongType),
      StructField("Finish Time", LongType)))),
    StructField("Task Metrics", StructType(Seq(
      StructField("Input Metrics", StructType(Seq(
        StructField("Records Read", LongType)))),
      StructField("Output Metrics", StructType(Seq(
        StructField("Records Written", LongType)))),
      StructField("Shuffle Write Metrics", StructType(Seq(
        StructField("Shuffle Records Written", LongType)))))))))

  /** One row per (app, job) across every event log under `path`:
    * (app, job_id, submitted_ms, duration_sec, n_stages, n_tasks,
    * input_records, shuffle_records, output_records, avg_task_sec).
    *
    * `app` is the log file's base name — job and stage IDs restart at 0
    * in every application, so all keying is per FILE and a directory of
    * many runs (a History Server dir) never cross-credits metrics.
    * Metrics come from the FIRST successful `SparkListenerTaskEnd` per
    * (stage, task index): failed, killed, and losing-speculative
    * attempts re-emit TaskEnd with a non-Success reason and are
    * dropped, and a stage retry's re-run successes dedup against the
    * original — one attempt per task, exactly what rumen's
    * `JobBuilder` records; the stage→job mapping from
    * `SparkListenerJobStart.Stage IDs`; wall time from the
    * JobStart/JobEnd timestamps. Events of any other type — and a stage
    * that never ran a task (skipped stages) — contribute nothing. A
    * stage shared by two jobs of one app (cache reuse) is credited to
    * each, as rumen does for shared-input jobs.
    */
  def jobHistory(spark: SparkSession, path: String): DataFrame = {
    val wanted = Seq("SparkListenerJobStart", "SparkListenerJobEnd",
      "SparkListenerTaskEnd")
    // one text scan; the parsed slice (tiny, fixed-width) is
    // materialized so the lanes below never rescan the raw log
    val events = spark.read.text(path)
      .filter(wanted.map(e => col("value").contains("\"" + e + "\""))
        .reduce(_ || _))
      .select(substring_index(input_file_name(), "/", -1).as("app"),
        from_json(col("value"), eventSchema).as("e"))
      .select(col("app"), col("e.*"))
      .filter(col("Event").isin(wanted: _*))
      .localCheckpoint()

    val starts = events
      .filter(col("Event") === "SparkListenerJobStart" &&
        col("`Job ID`").isNotNull)
      .select(col("app"), col("`Job ID`").as("job_id"),
        col("`Submission Time`").as("submitted_ms"),
        col("`Stage IDs`").as("stage_ids"))
    val ends = events
      .filter(col("Event") === "SparkListenerJobEnd" &&
        col("`Job ID`").isNotNull)
      .select(col("app"), col("`Job ID`").as("job_id"),
        col("`Completion Time`").as("completed_ms"))
    // One row per TASK, not per successful attempt: after a fetch-failure
    // stage retry the same task index re-runs and re-succeeds under a
    // later stage attempt, so successes are deduped on (app, stage,
    // index) keeping the earliest (stage attempt, task attempt) — the
    // one-attempt-per-task rumen's JobBuilder records. min over a struct
    // whose leading fields are the attempt keys makes the pick
    // deterministic. task_sec stays NULL when the log carries no
    // launch/finish times (truncated logs) so it cannot deflate the
    // average; such rows still count as tasks. A TaskEnd with no Task
    // Info at all is unattributable and collapses to one unknown-task
    // row per stage — only degenerate logs hit that.
    val tasks = events
      .filter(col("Event") === "SparkListenerTaskEnd" &&
        col("`Stage ID`").isNotNull &&
        col("`Task End Reason`.Reason") === "Success")
      .select(col("app"), col("`Stage ID`").as("stage_id"),
        coalesce(col("`Task Info`.Index"), col("`Task Info`.`Task ID`"))
          .as("task_idx"),
        coalesce(col("`Stage Attempt ID`"), lit(0L)).as("stage_att"),
        coalesce(col("`Task Info`.Attempt"), lit(0L)).as("task_att"),
        coalesce(col("`Task Metrics`.`Input Metrics`.`Records Read`"),
          lit(0L)).as("in_rec"),
        coalesce(col("`Task Metrics`.`Shuffle Write Metrics`.`Shuffle Records Written`"),
          lit(0L)).as("shuf_rec"),
        coalesce(col("`Task Metrics`.`Output Metrics`.`Records Written`"),
          lit(0L)).as("out_rec"),
        ((col("`Task Info`.`Finish Time`") -
          col("`Task Info`.`Launch Time`")) / 1e3).as("task_sec"))
      .groupBy("app", "stage_id", "task_idx").agg(
        min(struct(col("stage_att"), col("task_att"), col("in_rec"),
          col("shuf_rec"), col("out_rec"), col("task_sec"))).as("first"))
      .select(col("app"), col("stage_id"),
        col("first.in_rec").as("in_rec"),
        col("first.shuf_rec").as("shuf_rec"),
        col("first.out_rec").as("out_rec"),
        col("first.task_sec").as("task_sec"))

    val perStage = tasks.groupBy("app", "stage_id").agg(
      count(lit(1)).as("n_tasks"),
      sum("in_rec").as("input_records"),
      sum("shuf_rec").as("shuffle_records"),
      sum("out_rec").as("output_records"),
      sum("task_sec").as("task_secs"),
      count(col("task_sec")).as("n_timed"))

    val perJob = starts
      .select(col("app"), col("job_id"), explode(col("stage_ids")).as("stage_id"))
      .join(perStage, Seq("app", "stage_id"), "left")
      .groupBy("app", "job_id").agg(
        count(lit(1)).as("n_stages"),
        coalesce(sum("n_tasks"), lit(0L)).as("n_tasks"),
        coalesce(sum("input_records"), lit(0L)).as("input_records"),
        coalesce(sum("shuffle_records"), lit(0L)).as("shuffle_records"),
        coalesce(sum("output_records"), lit(0L)).as("output_records"),
        coalesce(sum("task_secs"), lit(0.0)).as("task_secs"),
        coalesce(sum("n_timed"), lit(0L)).as("n_timed"))

    starts.drop("stage_ids")
      .join(ends, Seq("app", "job_id"), "left")
      .join(perJob, Seq("app", "job_id"), "left")
      .select(col("app"), col("job_id"), col("submitted_ms"),
        ((col("completed_ms") - col("submitted_ms")) / 1e3).as("duration_sec"),
        col("n_stages"), col("n_tasks"), col("input_records"),
        col("shuffle_records"), col("output_records"),
        // mean first-success runtime (TaskInfo launch→finish) over the
        // tasks that carried times — what [[Sls.fromHistory]] replays
        // per task slot; a log with no times at all reports 0
        when(col("n_timed") > 0, col("task_secs") / col("n_timed"))
          .otherwise(lit(0.0)).as("avg_task_sec"))
  }

  /** Shape [[jobHistory]] rows into the GridMix-lite mix. The loadGen
    * replay shape is map-selectivity → shuffle → reduce-selectivity, so
    * mapPct ≈ shuffle-written / input-read and redPct ≈ output-written /
    * shuffle-read, each clamped to [0, 100]; a denominator of 0 (a pure
    * generator job, or a job that never shuffled) replays that stage
    * wide open. Replay volume is the job's LARGEST record flow —
    * input, shuffle, or output — so a write-only generator job (reads
    * nothing, shuffles nothing, writes 10^9 rows) keeps its scale in
    * the mix. Collects one row per JOB — bounded by the log's job
    * count.
    */
  def toTrace(history: DataFrame): Seq[LoadGen.TraceJob] = {
    def pct(num: String, den: String) =
      when(col(den) > 0,
        least(lit(100L), floor(col(num) * 100L / col(den)))).otherwise(100L)
    history
      .select(col("app"), col("job_id"),
        greatest(col("input_records"), col("shuffle_records"),
          col("output_records"), lit(1L)).as("rows"),
        pct("shuffle_records", "input_records").as("map_pct"),
        pct("output_records", "shuffle_records").as("red_pct"))
      .orderBy("app", "job_id")
      .collect()
      .toSeq
      .map(r => LoadGen.TraceJob(s"${r.getString(0)}/job_${r.getLong(1)}",
        r.getLong(2), r.getLong(3).toInt, r.getLong(4).toInt))
  }
}
