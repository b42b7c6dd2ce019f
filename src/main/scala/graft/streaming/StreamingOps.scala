package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming variants of the event operators.
  *
  * The reference is batch-only (SURVEY §2.9) — these are the engine's
  * extension surface: the same logical ops as EventQueries, expressed
  * over an unbounded source with watermarked state. Batch parity is the
  * correctness oracle (see StreamingSpec): a stream processed to
  * completion must agree with the batch query on the same data.
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregation (readStream -> agg).
    * State per (window, event_type) only; the watermark bounds it.
    */
  def windowedAgg(events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("val_sum"))

  /** Streaming exact dedup — the training-pipeline dedup op over an
    * unbounded source: duplicates arriving within the watermark horizon
    * are dropped, and state expires with the watermark (bounded, unlike
    * a naive global dropDuplicates whose state only grows).
    */
  def dedupStream(events: DataFrame, keys: Seq[String], watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Watermarked stream-stream self-join: for every `firstType` event,
    * the same user's `thenType` events within `within` (funnel
    * correlation, e.g. view -> purchase). Both join states are bounded
    * by watermark + interval — the range condition is what lets Spark
    * evict, so it is load-bearing at scale, not an optimization.
    */
  def followWithin(events: DataFrame, firstType: String, thenType: String,
                   within: String, watermark: String): DataFrame = {
    val a = events.filter(col("event_type") === firstType)
      .withWatermark("ts", watermark)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
        col("event_id").as("a_id"))
    val b = events.filter(col("event_type") === thenType)
      .withWatermark("ts", watermark)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_id"))
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"))
  }

  final case class Ev(user_id: Long, us: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Stateful sessionization with flatMapGroupsWithState: a session
    * closes when a gap larger than `gapUs` appears in a user's stream.
    * State is O(1) per user (the open session only). Closed sessions are
    * appended as they are detected; the final open session stays in
    * state (use [[sessionizeWithTimeout]] to flush it when the watermark
    * passes the gap).
    */
  def sessionize(events: Dataset[Ev], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.us)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          for (e <- sorted) {
            cur match {
              case Some(s) if e.us - s.end > gapUs =>
                closed += Session(userId, s.start, s.end, s.n)
                cur = Some(SessionState(e.us, e.us, 1))
              case Some(s) =>
                cur = Some(SessionState(s.start, e.us, s.n + 1))
              case None =>
                cur = Some(SessionState(e.us, e.us, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  final case class KV(k: String, v: Long)
  final case class AggState(n: Long, sum: Long)
  final case class Running(k: String, n: Long, sum: Long)

  /** The aggregate framework's LongValueSum as an UNBOUNDED running
    * aggregate: per-key count+sum that survives across micro-batches
    * (and restarts) in the transformWithState state store — Spark's
    * arbitrary-stateful operator (RocksDB-backed), the modern
    * replacement for flatMapGroupsWithState. Each batch that touches a
    * key emits that key's updated running report (Update output mode).
    */
  class RunningSumProcessor extends StatefulProcessor[String, KV, Running] {
    @transient private var st: ValueState[AggState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AggState]("agg",
        Encoders.product[AggState], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[KV],
                                 tv: TimerValues): Iterator[Running] = {
      val prev = if (st.exists()) st.get() else AggState(0L, 0L)
      var n = prev.n
      var s = prev.sum
      rows.foreach { r => n += 1; s += r.v }
      st.update(AggState(n, s))
      Iterator(Running(key, n, s))
    }
  }

  /** Streaming ValueAggregator (LongValueSum + count): requires the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  def runningAgg(events: Dataset[KV]): Dataset[Running] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.k)
      .transformWithState(new RunningSumProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class EvW(user_id: Long, us: Long, ts: java.sql.Timestamp)

  /** [[sessionize]] plus EventTimeTimeout: when the stream's watermark
    * passes a user's last event by more than the gap, the open session
    * is flushed WITHOUT waiting for stream end — the production form
    * (an idle user's final session must not be held hostage to their
    * next visit). Timeout is re-armed to (session end + gap) after every
    * batch; state stays O(1) per user and is removed on flush.
    */
  def sessionizeWithTimeout(events: Dataset[Ev], gapUs: Long,
                            watermark: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", watermark)
      .as[EvW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[EvW], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.end, s.n))
          } else {
            val sorted = evs.toSeq.sortBy(_.us)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              cur match {
                case Some(s) if e.us - s.end > gapUs =>
                  closed += Session(userId, s.start, s.end, s.n)
                  cur = Some(SessionState(e.us, e.us, 1))
                case Some(s) =>
                  cur = Some(SessionState(s.start, e.us, s.n + 1))
                case None =>
                  cur = Some(SessionState(e.us, e.us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush once the watermark passes end-of-session + gap
              state.setTimeoutTimestamp(s.end / 1000L + gapUs / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
