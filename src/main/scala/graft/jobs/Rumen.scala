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
  * an event-log directory into one row per job, and [[toTrace]] shapes
  * those rows into the [[LoadGen.TraceJob]] mix that
  * [[LoadGen.replayTrace]] (GridMix-lite) replays.
  *
  * Scale shape: the log is scanned ONCE as text and each lane parses
  * only its own events against an explicit schema (`from_json`, absent
  * fields → null) — no `read.json` inference pass, no failure when a
  * log never populated some nested metric. Reduction is two hash
  * aggregations (tasks→stage, stage→job) plus a join on the stage→job
  * map; only the final per-JOB rows (bounded by the log's job count,
  * not its task count) ever reach the driver, in [[toTrace]].
  */
object Rumen {

  private val startSchema = StructType(Seq(
    StructField("Job ID", LongType),
    StructField("Submission Time", LongType),
    StructField("Stage IDs", ArrayType(LongType))))

  private val endSchema = StructType(Seq(
    StructField("Job ID", LongType),
    StructField("Completion Time", LongType)))

  private val metric = StructType(Seq(
    StructField("Records Read", LongType),
    StructField("Records Written", LongType),
    StructField("Shuffle Records Written", LongType)))

  private val taskSchema = StructType(Seq(
    StructField("Stage ID", LongType),
    StructField("Task Metrics", StructType(Seq(
      StructField("Input Metrics", metric),
      StructField("Output Metrics", metric),
      StructField("Shuffle Write Metrics", metric))))))

  /** One row per Spark job in the event log(s) at `path`:
    * (job_id, submitted_ms, duration_sec, n_stages, n_tasks,
    * input_records, shuffle_records, output_records).
    *
    * Metrics come from `SparkListenerTaskEnd.Task Metrics`; the
    * stage→job mapping from `SparkListenerJobStart.Stage IDs`; wall
    * time from the JobStart/JobEnd timestamps. Events of any other
    * type — and a stage that never ran a task (skipped stages) —
    * contribute nothing. A stage shared by two jobs (cache reuse) is
    * credited to each, as rumen does for shared-input jobs.
    */
  def jobHistory(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    def lane(event: String, schema: StructType): DataFrame = lines
      .filter(col("value").contains("\"" + event + "\""))
      .select(from_json(col("value"), schema).as("e"))
      // contains() is a cheap pre-filter, not exact: re-check via the
      // parse — a line of another type parses to all-null fields.
      .filter(col("e").isNotNull)

    val starts = lane("SparkListenerJobStart", startSchema)
      .select(col("e.`Job ID`").as("job_id"),
        col("e.`Submission Time`").as("submitted_ms"),
        col("e.`Stage IDs`").as("stage_ids"))
      .filter(col("job_id").isNotNull)
    val ends = lane("SparkListenerJobEnd", endSchema)
      .select(col("e.`Job ID`").as("job_id"),
        col("e.`Completion Time`").as("completed_ms"))
      .filter(col("job_id").isNotNull)
    val tasks = lane("SparkListenerTaskEnd", taskSchema)
      .select(col("e.`Stage ID`").as("stage_id"),
        coalesce(col("e.`Task Metrics`.`Input Metrics`.`Records Read`"),
          lit(0L)).as("in_rec"),
        coalesce(col("e.`Task Metrics`.`Shuffle Write Metrics`.`Shuffle Records Written`"),
          lit(0L)).as("shuf_rec"),
        coalesce(col("e.`Task Metrics`.`Output Metrics`.`Records Written`"),
          lit(0L)).as("out_rec"))
      .filter(col("stage_id").isNotNull)

    val perStage = tasks.groupBy("stage_id").agg(
      count(lit(1)).as("n_tasks"),
      sum("in_rec").as("input_records"),
      sum("shuf_rec").as("shuffle_records"),
      sum("out_rec").as("output_records"))

    val perJob = starts
      .select(col("job_id"), explode(col("stage_ids")).as("stage_id"))
      .join(perStage, Seq("stage_id"), "left")
      .groupBy("job_id").agg(
        count(lit(1)).as("n_stages"),
        coalesce(sum("n_tasks"), lit(0L)).as("n_tasks"),
        coalesce(sum("input_records"), lit(0L)).as("input_records"),
        coalesce(sum("shuffle_records"), lit(0L)).as("shuffle_records"),
        coalesce(sum("output_records"), lit(0L)).as("output_records"))

    starts.drop("stage_ids")
      .join(ends, Seq("job_id"), "left")
      .join(perJob, Seq("job_id"), "left")
      .select(col("job_id"), col("submitted_ms"),
        ((col("completed_ms") - col("submitted_ms")) / 1e3).as("duration_sec"),
        col("n_stages"), col("n_tasks"), col("input_records"),
        col("shuffle_records"), col("output_records"))
  }

  /** Shape [[jobHistory]] rows into the GridMix-lite mix. The loadGen
    * replay shape is map-selectivity → shuffle → reduce-selectivity, so
    * mapPct ≈ shuffle-written / input-read and redPct ≈ output-written /
    * shuffle-read, each clamped to [0, 100]; a denominator of 0 (a pure
    * generator job, or a job that never shuffled) replays that stage
    * wide open. Collects one row per JOB — bounded by the log's job
    * count.
    */
  def toTrace(history: DataFrame): Seq[LoadGen.TraceJob] = {
    def pct(num: String, den: String) =
      when(col(den) > 0,
        least(lit(100L), floor(col(num) * 100L / col(den)))).otherwise(100L)
    history
      .select(col("job_id"),
        greatest(col("input_records"), col("shuffle_records"), lit(1L))
          .as("rows"),
        pct("shuffle_records", "input_records").as("map_pct"),
        pct("output_records", "shuffle_records").as("red_pct"))
      .orderBy("job_id")
      .collect()
      .toSeq
      .map(r => LoadGen.TraceJob(s"job_${r.getLong(0)}", r.getLong(1),
        r.getLong(2).toInt, r.getLong(3).toInt))
  }
}
